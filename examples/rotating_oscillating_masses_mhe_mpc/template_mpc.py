"""Setpoint-tracking MPC for the rotating masses (mirrors reference
examples/rotating_oscillating_masses_mhe_mpc/template_mpc.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_mpc(model):
    mpc = dm.controller.MPC(model)

    mpc.settings.n_robust = 0
    mpc.settings.n_horizon = 20
    mpc.settings.t_step = 0.1
    mpc.settings.store_full_solution = True

    lterm = (model.x["phi_2"] - model.tvp["phi_2_set"]) ** 2
    mpc.set_objective(mterm=sym.const(1.0), lterm=lterm)
    mpc.set_rterm(phi_m_set=1e-2)

    # pseudo-random setpoint trajectory (seeded like the reference test)
    np.random.seed(999)
    tvp_traj = [np.array([0.0])]
    for i in range(400):
        tvp_next = (0.5 - np.random.rand()) * np.pi
        switch = np.random.rand() >= 0.95
        tvp_traj.append((1 - switch) * tvp_traj[i] + switch * tvp_next)
    tvp_traj = np.concatenate(tvp_traj)

    tvp_template = mpc.get_tvp_template()

    def tvp_fun(t_now):
        ind = int(t_now / mpc.settings.t_step)
        for k in range(mpc.settings.n_horizon):
            tvp_template["_tvp", k, "phi_2_set"] = tvp_traj[ind + k]
        return tvp_template

    mpc.set_tvp_fun(tvp_fun)

    mpc.set_uncertainty_values(
        Theta_1=2.25e-4 * np.array([1.0, 1.1]),
        Theta_2=2.25e-4 * np.array([1.0]),
        Theta_3=2.25e-4 * np.array([1.0]),
    )
    mpc.bounds["lower", "_u", "phi_m_set"] = -5
    mpc.bounds["upper", "_u", "phi_m_set"] = 5

    mpc.setup()
    return mpc
