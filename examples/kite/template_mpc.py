"""Robust tether-force-maximizing kite MPC with a soft minimum-height
constraint over a 3-scenario wind tree (mirrors reference
examples/kite/template_mpc.py; n_horizon=80 there — default trimmed for
runtime, override with DOMPC_KITE_N)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_mpc(model, w_ref=8.0, E_0v=5.0, h_min=100.0):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = int(os.environ.get("DOMPC_KITE_N", "40"))
    mpc.settings.t_step = 0.15

    mpc.set_objective(mterm=sym.const(0.0), lterm=-model.aux["T_F"] / 1e4)
    mpc.set_rterm(u_tilde=0.5)

    mpc.bounds["lower", "_x", "theta"] = 0.0
    mpc.bounds["lower", "_x", "phi"] = -0.5 * np.pi
    mpc.bounds["lower", "_x", "psi"] = -1.0 * np.pi
    mpc.bounds["upper", "_x", "theta"] = 0.5 * np.pi
    mpc.bounds["upper", "_x", "phi"] = 0.5 * np.pi
    mpc.bounds["upper", "_x", "psi"] = 1.0 * np.pi
    mpc.bounds["lower", "_u", "u_tilde"] = -10
    mpc.bounds["upper", "_u", "u_tilde"] = 10

    mpc.set_nl_cons("height_kite", -model.aux["height_kite"], ub=-h_min,
                    soft_constraint=True, penalty_term_cons=1e3,
                    maximum_violation=10)

    mpc.set_uncertainty_values(
        E_0=np.array([E_0v]),
        v_0=np.array([w_ref, w_ref * 0.8, w_ref * 1.2]))

    mpc.setup()
    return mpc
