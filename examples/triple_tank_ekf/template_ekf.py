"""Extended Kalman filter for the triple tank (mirrors reference
examples/triple_tank_ekf/template_ekf.py): fixed parameter p1 = 2, a
valve schedule tvp1 switching from 0.5 to 1 at t = 50."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_ekf(model):
    ekf = dm.estimator.EKF(model)
    ekf.settings.t_step = 1

    p_template = ekf.get_p_template()

    def p_fun_ekf(t_now):
        p_template["p1"] = 2
        return p_template
    ekf.set_p_fun(p_fun_ekf)

    tvp_template = ekf.get_tvp_template()

    def tvp_fun_ekf(t_now):
        tvp_template["tvp1"] = 0.5 if t_now < 50 else 1.0
        return tvp_template
    ekf.set_tvp_fun(tvp_fun_ekf)

    ekf.setup()
    return ekf
