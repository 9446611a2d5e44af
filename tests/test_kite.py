"""Kite power-generation MPC (reference: examples/kite) — no reference
golden pickle exists, so this is a self-consistency test: solver converges,
the soft height constraint (with finite maximum_violation) is respected
within its violation budget."""
import numpy as np
import pytest

from dompc_tpu.systems import kite_model, kite_mpc, kite_simulator


@pytest.mark.slow
def test_kite_mpc():
    h_min = 100.0
    model = kite_model()
    mpc = kite_mpc(model, n_horizon=40, h_min=h_min)
    sim = kite_simulator(model)

    x0 = np.array([0.5, 0.3, 0.0])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    heights = []
    for _ in range(3):
        u0 = mpc.make_step(x0)
        assert mpc.solver_stats["kkt_err"] < 1e-6, mpc.solver_stats
        y = sim.make_step(u0)
        x0 = y.reshape(-1)
        heights.append(400.0 * np.sin(x0[0]) * np.cos(x0[1]))
    # soft height constraint: violation bounded by maximum_violation
    assert min(heights) > h_min - 10.0 - 1e-6, heights
