"""Plant simulator for the rotating masses (mirrors reference
examples/rotating_oscillating_masses_mhe_mpc/template_simulator.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=0.1)

    p_template = simulator.get_p_template()

    def p_fun(t_now):
        p_template["P_p"] = 1.0
        p_template["Theta_1"] = 2.25e-4
        p_template["Theta_2"] = 2.25e-4
        p_template["Theta_3"] = 2.25e-4
        return p_template

    simulator.set_p_fun(p_fun)

    tvp_template = simulator.get_tvp_template()
    simulator.set_tvp_fun(lambda t_now: tvp_template)

    simulator.setup()
    return simulator
