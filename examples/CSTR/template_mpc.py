"""Robust multi-stage MPC for the CSTR (mirrors reference
examples/CSTR/template_mpc.py:44-102): track C_b = 0.6 while keeping the
reactor temperature under a soft constraint, robust against alpha/beta
uncertainty via a 9-branch scenario tree (n_robust=1).
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_mpc(model, silence_solver=False):
    mpc = dm.controller.MPC(model)

    mpc.settings.n_horizon = 20
    mpc.settings.n_robust = 1
    mpc.settings.open_loop = 0
    mpc.settings.t_step = 0.005
    mpc.settings.state_discretization = "collocation"
    mpc.settings.collocation_type = "radau"
    mpc.settings.collocation_deg = 2
    mpc.settings.collocation_ni = 1
    mpc.settings.store_full_solution = True
    if silence_solver:
        mpc.settings.supress_ipopt_output()

    mpc.scaling["_x", "T_R"] = 100
    mpc.scaling["_x", "T_K"] = 100
    mpc.scaling["_u", "Q_dot"] = 2000
    mpc.scaling["_u", "F"] = 100

    _x = model.x
    mterm = (_x["C_b"] - 0.6) ** 2
    lterm = (_x["C_b"] - 0.6) ** 2
    mpc.set_objective(mterm=mterm, lterm=lterm)
    mpc.set_rterm(F=0.1, Q_dot=1e-3)

    mpc.bounds["lower", "_x", "C_a"] = 0.1
    mpc.bounds["lower", "_x", "C_b"] = 0.1
    mpc.bounds["lower", "_x", "T_R"] = 50
    mpc.bounds["lower", "_x", "T_K"] = 50
    mpc.bounds["upper", "_x", "C_a"] = 2
    mpc.bounds["upper", "_x", "C_b"] = 2
    mpc.bounds["upper", "_x", "T_K"] = 140
    mpc.bounds["lower", "_u", "F"] = 5
    mpc.bounds["lower", "_u", "Q_dot"] = -8500
    mpc.bounds["upper", "_u", "F"] = 100
    mpc.bounds["upper", "_u", "Q_dot"] = 0.0

    # reactor temperature as a soft constraint (exact-penalty slack)
    mpc.set_nl_cons("T_R", _x["T_R"], ub=140, soft_constraint=True,
                    penalty_term_cons=1e2)

    alpha_var = np.array([1.0, 1.05, 0.95])
    beta_var = np.array([1.0, 1.1, 0.9])
    mpc.set_uncertainty_values(alpha=alpha_var, beta=beta_var)

    mpc.setup()
    return mpc
