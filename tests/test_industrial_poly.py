"""Industrial batch polymerization closed loop vs reference golden run
(reference test: testing/test_industrial_poly.py — 10 states, robust
multi-stage over delH_R x k_0 → 9-branch scenario tree, N=20)."""
import numpy as np
import pytest

import dompc_tpu as dm
from dompc_tpu.systems import (
    industrial_poly_model, industrial_poly_mpc, industrial_poly_simulator,
    industrial_poly_x0,
)
from golden import load_golden


@pytest.mark.slow
def test_industrial_poly_closed_loop():
    ref = load_golden("results_industrial_poly")
    model = industrial_poly_model()
    mpc = industrial_poly_mpc(model)
    sim = industrial_poly_simulator(model)
    est = dm.estimator.StateFeedback(model)

    x0 = industrial_poly_x0()
    mpc.x0 = x0
    sim.x0 = x0
    est.x0 = x0
    mpc.set_initial_guess()
    n_steps = 5
    for _ in range(n_steps):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = est.make_step(y)

    # states span O(1e4 kg) masses to O(360 K) temperatures — compare
    # relative, like the reference compares in its own solver tolerance
    err_x = (np.abs(mpc.data._x - ref["mpc"]._x[:n_steps])
             / (1.0 + np.abs(ref["mpc"]._x[:n_steps]))).max()
    assert err_x < 2e-3, f"x rel err {err_x:.2e}"
    u_scale = np.array([3.0e4, 373.15, 373.15])
    err_u = (np.abs(mpc.data._u - ref["mpc"]._u[:n_steps]) / u_scale).max()
    assert err_u < 2e-2, f"u scaled err {err_u:.2e}"
    err_sim = (np.abs(sim.data._x - ref["simulator"]._x[:n_steps])
               / (1.0 + np.abs(ref["simulator"]._x[:n_steps]))).max()
    assert err_sim < 2e-3, f"sim rel err {err_sim:.2e}"
