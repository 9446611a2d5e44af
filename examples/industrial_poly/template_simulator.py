"""Simulator at the nominal parameter values (mirrors reference
examples/industrial_poly/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=50.0 / 3600.0, substeps=4)
    p_num = simulator.get_p_template()
    p_num["delH_R"] = 950.0
    p_num["k_0"] = 7.0
    simulator.set_p_fun(lambda t: p_num)
    simulator.setup()
    return simulator
