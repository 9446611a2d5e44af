"""MINLP MPC steering both populations to 1 (mirrors reference
examples/Lotka_Volterra/template_mpc.py; BONMIN there, batched
branch-and-bound here — dompc_tpu/solver/minlp.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_mpc(model):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 25
    mpc.settings.n_robust = 0
    mpc.settings.t_step = 0.3
    mpc.settings.collocation_deg = 2
    mpc.settings.collocation_ni = 2

    x_0 = model.x["x_0"]
    x_1 = model.x["x_1"]
    mterm = (x_0 - 1) ** 2 + (x_1 - 1) ** 2
    mpc.set_objective(mterm=mterm, lterm=mterm)
    mpc.set_rterm(inp=1)

    mpc.bounds["lower", "_x", "x_0"] = 0.0
    mpc.bounds["lower", "_x", "x_1"] = 0.0
    mpc.bounds["upper", "_x", "x_0"] = 2.0
    mpc.bounds["lower", "_u", "inp"] = 0.0
    mpc.bounds["upper", "_u", "inp"] = 1.0

    mpc.setup()
    return mpc
