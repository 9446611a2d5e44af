"""Simulator for the discrete-DAE oscillating masses (mirrors reference
examples/oscillating_masses_discrete_dae/template_simulator.py): the
algebraic condition is solved by Newton iteration each step."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=0.5)
    simulator.setup()
    return simulator
