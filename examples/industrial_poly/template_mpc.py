"""Robust multi-stage product-maximizing MPC for the polymerization
reactor (mirrors reference examples/industrial_poly/template_mpc.py):
9-branch scenario tree over (delH_R, k_0), hard safety-temperature
bounds in the robust setting."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_mpc(model, n_horizon=20, n_robust=1):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = n_horizon
    mpc.settings.n_robust = n_robust
    mpc.settings.t_step = 50.0 / 3600.0
    mpc.settings.store_full_solution = True

    mpc.set_objective(mterm=-model.x["m_P"], lterm=-model.x["m_P"])
    mpc.set_rterm(m_dot_f=0.002, T_in_M=0.004, T_in_EK=0.002)

    temp_range = 2.0
    mpc.bounds["lower", "_x", "m_W"] = 0.0
    mpc.bounds["lower", "_x", "m_A"] = 0.0
    mpc.bounds["lower", "_x", "m_P"] = 26.0
    mpc.bounds["lower", "_x", "T_R"] = 363.15 - temp_range
    mpc.bounds["lower", "_x", "T_S"] = 298.0
    mpc.bounds["lower", "_x", "Tout_M"] = 298.0
    mpc.bounds["lower", "_x", "T_EK"] = 288.0
    mpc.bounds["lower", "_x", "Tout_AWT"] = 288.0
    mpc.bounds["lower", "_x", "accum_monom"] = 0.0
    mpc.bounds["upper", "_x", "T_S"] = 400.0
    mpc.bounds["upper", "_x", "Tout_M"] = 400.0
    mpc.bounds["upper", "_x", "T_EK"] = 400.0
    mpc.bounds["upper", "_x", "Tout_AWT"] = 400.0
    mpc.bounds["upper", "_x", "accum_monom"] = 30000.0
    mpc.bounds["upper", "_x", "T_adiab"] = 382.15
    mpc.bounds["lower", "_u", "m_dot_f"] = 0.0
    mpc.bounds["lower", "_u", "T_in_M"] = 333.15
    mpc.bounds["lower", "_u", "T_in_EK"] = 333.15
    mpc.bounds["upper", "_u", "m_dot_f"] = 3.0e4
    mpc.bounds["upper", "_u", "T_in_M"] = 373.15
    mpc.bounds["upper", "_u", "T_in_EK"] = 373.15

    mpc.scaling["_x", "m_W"] = 10
    mpc.scaling["_x", "m_A"] = 10
    mpc.scaling["_x", "m_P"] = 10
    mpc.scaling["_x", "accum_monom"] = 10
    mpc.scaling["_u", "m_dot_f"] = 100

    if n_robust == 0:
        mpc.set_nl_cons("T_R_UB", model.x["T_R"], ub=363.15 + temp_range,
                        soft_constraint=True, penalty_term_cons=1e4)
    else:
        mpc.bounds["upper", "_x", "T_R"] = 363.15 + temp_range

    mpc.set_uncertainty_values(
        delH_R=np.array([950.0, 950.0 * 1.30, 950.0 * 0.70]),
        k_0=np.array([7.0, 7.0 * 1.30, 7.0 * 0.70]))

    mpc.setup()
    return mpc
