"""Drive to (X_p, Y_p) = (3, 2) at zero heading (mirrors reference
examples/kinematic_bicycle_model/template_mpc.py:45-90)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_mpc(model):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 10
    mpc.settings.t_step = 0.05
    mpc.settings.store_full_solution = True

    x = model.x
    mterm = (x["Y_p"] - 2) ** 2 + (x["X_p"] - 3) ** 2 + x["Psi"] ** 2
    lterm = 0 * (x["Y_p"] - 1) ** 2
    mpc.set_objective(mterm=mterm, lterm=lterm)
    mpc.set_rterm(Delta=1.0, Acc=1e-3)

    for nm, lo, hi in (("X_p", -50, 50), ("Y_p", -50, 50),
                       ("Psi", -np.pi / 2, np.pi / 2), ("V", -5, 5)):
        mpc.bounds["lower", "_x", nm] = lo
        mpc.bounds["upper", "_x", nm] = hi
    for nm in ("Delta", "Acc"):
        mpc.bounds["lower", "_u", nm] = -5
        mpc.bounds["upper", "_u", nm] = 5

    mpc.setup()
    return mpc
