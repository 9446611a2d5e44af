"""Plant simulator for the CSTR (mirrors reference
examples/CSTR/template_simulator.py): adaptive implicit integration at
abstol/reltol 1e-10 with nominal parameter values.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(integration_tool="cvodes", abstol=1e-10,
                        reltol=1e-10, t_step=0.005)

    tvp_num = simulator.get_tvp_template()
    simulator.set_tvp_fun(lambda t_now: tvp_num)

    p_num = simulator.get_p_template()
    p_num["alpha"] = 1
    p_num["beta"] = 1
    simulator.set_p_fun(lambda t_now: p_num)

    simulator.setup()
    return simulator
