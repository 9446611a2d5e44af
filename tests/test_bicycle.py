"""Bicycle-model vehicle MPC (reference: examples/kinematic_bicycle_model
and examples/dynamic_bicycle_model) — no reference golden pickles exist,
so these are self-consistency tests: the solver converges every step and
the closed loop actually drives toward its setpoint."""
import numpy as np
import pytest

from dompc_tpu.systems import (
    kinematic_bicycle_model, kinematic_bicycle_mpc,
    kinematic_bicycle_simulator,
    dynamic_bicycle_model, dynamic_bicycle_mpc, dynamic_bicycle_simulator,
)


def test_kinematic_bicycle_closed_loop():
    model = kinematic_bicycle_model()
    mpc = kinematic_bicycle_mpc(model)
    sim = kinematic_bicycle_simulator(model)
    x0 = np.array([0.0, 0.0, 0.0, 0.1])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    for _ in range(25):
        u0 = mpc.make_step(x0)
        assert mpc.solver_stats["kkt_err"] < 1e-6, mpc.solver_stats
        x0 = sim.make_step(u0).reshape(-1)
        assert np.all(np.abs(u0.reshape(-1)) <= 5 + 1e-9)
    # target is (X_p, Y_p) = (3, 2); 25 steps at 0.05 s gets it moving
    start_dist = np.hypot(3.0, 2.0)
    dist = np.hypot(x0[0] - 3.0, x0[1] - 2.0)
    assert dist < 0.65 * start_dist, (dist, x0)


@pytest.mark.slow
def test_dynamic_bicycle_closed_loop():
    model = dynamic_bicycle_model()
    mpc = dynamic_bicycle_mpc(model)
    sim = dynamic_bicycle_simulator(model)
    x0 = np.array([0.0, 0.0, 0.0, 0.1, 0.0, 0.0])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    ys = []
    for _ in range(30):
        u0 = mpc.make_step(x0)
        assert mpc.solver_stats["kkt_err"] < 1e-6, mpc.solver_stats
        u = u0.reshape(-1)
        assert -2 - 1e-9 <= u[0] <= 2 + 1e-9
        assert -1e-9 <= u[1] <= 1 + 1e-9
        x0 = sim.make_step(u0).reshape(-1)
        ys.append(x0[1])
    # lateral setpoint Y_p = 1: closed loop approaches it monotonically
    # enough that the last measured position is most of the way there
    assert ys[-1] > 0.5, ys
    assert abs(ys[-1]) <= 2 + 1e-6
