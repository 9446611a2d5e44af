"""Simulator for the kinematic bicycle (mirrors reference
examples/kinematic_bicycle_model/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=0.05, substeps=2)
    simulator.setup()
    return simulator
