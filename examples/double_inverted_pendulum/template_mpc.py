"""Energy-based swing-up MPC for the double inverted pendulum (mirrors
reference examples/double_inverted_pendulum/template_mpc.py:43-51:
N=100, Radau degree 3, t_step 0.04 s, obstacle nl_cons)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dompc_tpu as dm


def template_mpc(model, n_horizon=100):
    mpc = dm.controller.MPC(model)

    mpc.settings.n_horizon = n_horizon
    mpc.settings.n_robust = 0
    mpc.settings.t_step = 0.04
    mpc.settings.collocation_deg = 3
    mpc.settings.collocation_ni = 1
    mpc.settings.store_full_solution = True

    mterm = model.aux["E_kin"] - model.aux["E_pot"]
    lterm = -model.aux["E_pot"] + 10 * (model.x["pos"]) ** 2
    mpc.set_objective(mterm=mterm, lterm=lterm)
    mpc.set_rterm(force=0.1)

    mpc.bounds["lower", "_u", "force"] = -4
    mpc.bounds["upper", "_u", "force"] = 4

    mpc.set_nl_cons("obstacles", -model.aux["obstacle_distance"], 0)

    mpc.setup()
    return mpc
