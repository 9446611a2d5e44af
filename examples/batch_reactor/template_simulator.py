"""Simulator for the fed-batch bioreactor (mirrors reference
examples/batch_reactor/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(integration_tool="cvodes", abstol=1e-10,
                        reltol=1e-10, t_step=1.0)

    p_num = simulator.get_p_template()
    p_num["Y_x"] = 0.4
    p_num["S_in"] = 200.0
    simulator.set_p_fun(lambda t_now: p_num)

    simulator.setup()
    return simulator
