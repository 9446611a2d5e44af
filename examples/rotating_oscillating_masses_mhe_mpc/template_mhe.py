"""Moving-horizon estimator jointly estimating the state and the inertia
Theta_1 (mirrors reference examples/rotating_oscillating_masses_mhe_mpc/
template_mhe.py:40-108)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_mhe(model):
    mhe = dm.estimator.MHE(model, ["Theta_1"])

    mhe.settings.n_horizon = 10
    mhe.settings.t_step = 0.1
    mhe.settings.store_full_solution = True
    mhe.settings.nl_cons_check_colloc_points = True

    P_v = model.tvp["P_v"]
    P_x = 1e-4 * np.eye(8)
    P_p = model.p["P_p"]
    mhe.set_default_objective(P_x, P_v, P_p)

    tvp_template = mhe.get_tvp_template()
    for k in range(mhe.settings.n_horizon):
        tvp_template["_tvp", k, "P_v"] = np.diag(
            np.array([1.0, 1, 1, 20, 20]))
    mhe.set_tvp_fun(lambda t_now: tvp_template)

    p_template = mhe.get_p_template()

    def p_fun_mhe(t_now):
        p_template["P_p"] = 1.0
        p_template["Theta_2"] = 2.25e-4
        p_template["Theta_3"] = 2.25e-4
        return p_template

    mhe.set_p_fun(p_fun_mhe)

    y_template = mhe.get_y_template()

    def y_fun(t_now):
        n_steps = min(mhe.data._y.shape[0], mhe.settings.n_horizon)
        for k in range(-n_steps, 0):
            y_template["y_meas", k] = mhe.data._y[k]
        return y_template

    mhe.set_y_fun(y_fun)

    mhe.bounds["lower", "_u", "phi_m_set"] = -5
    mhe.bounds["upper", "_u", "phi_m_set"] = 5
    mhe.bounds["lower", "_x", "dphi"] = -6
    mhe.bounds["upper", "_x", "dphi"] = 6
    mhe.set_nl_cons("p_est_lb", -mhe._p_est["Theta_1"] + 1e-5, 0)
    mhe.set_nl_cons("p_est_ub", mhe._p_est["Theta_1"] - 1e-3, 0)

    mhe.setup()
    return mhe
