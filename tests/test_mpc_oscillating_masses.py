"""End-to-end closed-loop MPC parity vs reference IPOPT golden data
(reference test: testing/test_oscillating_masses_discrete.py)."""
import numpy as np

import dompc_tpu as dm
from golden import load_golden
import systems


def test_closed_loop_golden():
    ref = load_golden("results_oscillatingMasses")
    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    estimator = dm.estimator.StateFeedback(model)

    np.random.seed(99)
    x0 = np.random.rand(model.n_x) - 0.5
    mpc.x0 = x0
    sim.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for _ in range(5):
        u0 = mpc.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = estimator.make_step(y_next)

    for attr in ["_x", "_u", "_time"]:
        for module, mine in (("mpc", mpc.data), ("simulator", sim.data)):
            mymat = getattr(mine, attr)
            refmat = getattr(ref[module], attr)
            err = np.max(np.abs(mymat - refmat))
            assert err < 1e-5, f"{module}{attr}: max diff {err:.3e}"
    # tighter check on the control sequence (BASELINE target 1e-4)
    err_u = np.max(np.abs(mpc.data._u - ref["mpc"]._u))
    assert err_u < 1e-6, f"u-sequence diff {err_u:.3e}"
