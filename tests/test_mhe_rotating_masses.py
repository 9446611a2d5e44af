"""Coupled MHE + MPC closed loop vs reference golden run
(reference test: testing/test_rotating_oscillating_masses_mhe_mpc.py)."""
import numpy as np
import pytest

from dompc_tpu.systems import (
    rotating_masses_model, rotating_masses_mpc,
    rotating_masses_simulator, rotating_masses_mhe,
)
from golden import load_golden


@pytest.mark.slow
def test_rotating_masses_mhe_mpc_loop():
    ref = load_golden("results_rotatingMasses")
    model = rotating_masses_model()
    mpc = rotating_masses_mpc(model)
    sim = rotating_masses_simulator(model)
    mhe = rotating_masses_mhe(model)

    np.random.seed(99)
    x0_true = np.random.rand(model.n_x) - 0.5
    x0 = np.zeros(model.n_x)
    mpc.x0 = x0
    sim.x0 = x0_true
    mhe.x0 = x0
    mhe.p_est0 = 1e-4
    mpc.set_initial_guess()
    mhe.set_initial_guess()

    for _ in range(5):
        u0 = mpc.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = mhe.make_step(y_next)

    for module, mine in (("mpc", mpc.data), ("simulator", sim.data),
                         ("estimator", mhe.data)):
        for attr in ("_x", "_u", "_time"):
            mymat = getattr(mine, attr)
            refmat = getattr(ref[module], attr)
            if refmat.size == 0:
                continue
            err = np.max(np.abs(mymat - refmat))
            assert err < 5e-3, f"{module}{attr}: max diff {err:.2e}"
