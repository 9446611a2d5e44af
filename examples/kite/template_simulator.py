"""Simulator for the kite system at the nominal wind (mirrors reference
examples/kite/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model, w_ref=8.0, E_0v=5.0):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=0.15, substeps=4)
    p_num = simulator.get_p_template()
    p_num["E_0"] = E_0v
    p_num["v_0"] = w_ref
    simulator.set_p_fun(lambda t: p_num)
    simulator.setup()
    return simulator
