"""MPC on the NN surrogate model (mirrors reference
examples/tools/pytorch_2_do-mpc/template_mpc.py): drive the mass back to
the origin under position/input bounds."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_mpc(model):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 20
    mpc.settings.t_step = 0.1
    mpc.settings.store_full_solution = True

    cost = sym.sum1(model.x["states"] ** 2)
    mpc.set_objective(mterm=100 * cost, lterm=100 * cost)
    mpc.set_rterm(inputs=1e-4)

    lbx = np.array([[-0.01], [-2.65 / 100]])
    ubx = np.array([[0.01], [2.65 / 100]])
    mpc.bounds["lower", "_x", "states"] = lbx
    mpc.bounds["upper", "_x", "states"] = ubx
    mpc.bounds["lower", "_u", "inputs"] = -0.1
    mpc.bounds["upper", "_u", "inputs"] = 0.1

    mpc.setup()
    return mpc
