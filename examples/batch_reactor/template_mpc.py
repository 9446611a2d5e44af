"""Economic MPC maximizing product P_s over a 3x3 scenario tree
(mirrors reference examples/batch_reactor/template_mpc.py:43-83)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_mpc(model):
    mpc = dm.controller.MPC(model)

    mpc.settings.n_horizon = 20
    mpc.settings.n_robust = 1
    mpc.settings.open_loop = 0
    mpc.settings.t_step = 1.0
    mpc.settings.collocation_deg = 2
    mpc.settings.collocation_ni = 2
    mpc.settings.store_full_solution = True

    mpc.set_objective(mterm=-model.x["P_s"], lterm=-model.x["P_s"])
    mpc.set_rterm(inp=1.0)

    mpc.bounds["lower", "_x", "X_s"] = 0.0
    mpc.bounds["lower", "_x", "S_s"] = -0.01
    mpc.bounds["lower", "_x", "P_s"] = 0.0
    mpc.bounds["lower", "_x", "V_s"] = 0.0
    mpc.bounds["upper", "_x", "X_s"] = 3.7
    mpc.bounds["upper", "_x", "P_s"] = 3.0
    mpc.bounds["lower", "_u", "inp"] = 0.0
    mpc.bounds["upper", "_u", "inp"] = 0.2

    Y_x_values = np.array([0.5, 0.4, 0.3])
    S_in_values = np.array([200.0, 220.0, 180.0])
    mpc.set_uncertainty_values(Y_x=Y_x_values, S_in=S_in_values)

    mpc.setup()
    return mpc
