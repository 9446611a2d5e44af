"""Track the lateral setpoint Y_p = 1 (mirrors reference
examples/dynamic_bicycle_model/template_mpc.py:42-93)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_mpc(model):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 10
    mpc.settings.t_step = 0.1
    mpc.settings.store_full_solution = True

    track = (model.x["Y_p"] - 1.0) ** 2
    mpc.set_objective(mterm=track, lterm=track)
    mpc.set_rterm(Delta=1e-3, d=1e-3)

    for nm, lo, hi in (("X_p", -50000, 50000), ("Y_p", -2, 2),
                       ("Psi", -0.78, 0.78), ("V_x", 0.1, 5),
                       ("V_y", -1, 1), ("W", -0.2, 0.2)):
        mpc.bounds["lower", "_x", nm] = lo
        mpc.bounds["upper", "_x", nm] = hi
    mpc.bounds["lower", "_u", "Delta"] = -2
    mpc.bounds["upper", "_u", "Delta"] = 2
    mpc.bounds["lower", "_u", "d"] = 0
    mpc.bounds["upper", "_u", "d"] = 1

    mpc.setup()
    return mpc
