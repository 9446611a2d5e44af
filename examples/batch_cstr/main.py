"""Batched robust CSTR NMPC: thousands of scenario solves per call
(the TPU-native replacement for the reference's multiprocessing sampling
studies; see dompc_tpu/parallel)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax.numpy as jnp

from __graft_entry__ import _build_cstr_mpc
from dompc_tpu.parallel import make_batch_solver, initial_guess_from_x0


def main(B=16):
    mpc = _build_cstr_mpc(n_horizon=20, n_robust=1)
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    mpc.set_initial_guess()

    rng = np.random.default_rng(0)
    x0s = x0[None, :] * (1.0 + 0.02 * rng.standard_normal((B, 4)))
    w0s = initial_guess_from_x0(mpc, x0s)

    solve_batch = make_batch_solver(mpc, tol=1e-6, max_iter=60)
    sol, u0s = solve_batch(jnp.asarray(x0s), jnp.asarray(w0s))
    print("success:", np.asarray(sol.success).mean())
    print("iterations:", np.asarray(sol.iterations))
    print("first inputs:\n", np.round(np.asarray(u0s), 3))


if __name__ == "__main__":
    main()
