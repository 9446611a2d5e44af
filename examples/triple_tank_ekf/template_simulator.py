"""Plant simulator for the triple tank (mirrors reference
examples/triple_tank_ekf/template_simulator.py): same parameter and valve
schedule as the EKF."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_simulator(model):
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=1)

    p_template = simulator.get_p_template()

    def p_fun(t_now):
        p_template["p1"] = 2
        return p_template
    simulator.set_p_fun(p_fun)

    tvp_template = simulator.get_tvp_template()

    def tvp_fun(t_now):
        tvp_template["tvp1"] = 0.5 if t_now < 50 else 1.0
        return tvp_template
    simulator.set_tvp_fun(tvp_fun)

    simulator.setup()
    return simulator
