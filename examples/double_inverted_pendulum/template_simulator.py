"""DAE plant simulator for the double inverted pendulum (mirrors
reference examples/double_inverted_pendulum/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(integration_tool="idas", abstol=1e-8, reltol=1e-8,
                        t_step=0.04)
    simulator.setup()
    return simulator
