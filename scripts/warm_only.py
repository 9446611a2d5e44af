"""Minimal warm-throughput measurement (A/B tool): one number, no RTI."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _build_cstr_mpc
    from dompc_tpu.parallel import make_batch_solver, initial_guess_from_x0

    B = int(os.environ.get("DOMPC_BENCH_B", "128"))
    reps = int(os.environ.get("DOMPC_BENCH_REPS", "5"))
    mpc = _build_cstr_mpc(n_horizon=20, n_robust=1)
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    mpc.set_initial_guess()
    rng = np.random.default_rng(0)
    x0s = x0[None, :] * (1.0 + 0.02 * rng.standard_normal((B, 4)))
    x0s = np.clip(x0s, [0.15, 0.15, 55, 55], [1.9, 1.9, 139.5, 139.5])
    X = jnp.asarray(x0s)
    W = jnp.asarray(initial_guess_from_x0(mpc, x0s))
    solve_batch = make_batch_solver(mpc, tol=1e-3, max_iter=60,
                                    throughput_mode=True)
    t0 = time.perf_counter()
    sol, u0s = solve_batch(X, W)
    jax.block_until_ready(u0s)
    t_cold = time.perf_counter() - t0
    X_w = X * (1.0 + 1e-3)
    M_w = jnp.full((B,), 1e-4, X.dtype)
    sol_w, u0s_w = solve_batch(X_w, sol.w, sol.lam, M_w, sol.zl, sol.zu)
    jax.block_until_ready(u0s_w)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            sol_w, u0s_w = solve_batch(X_w, sol.w, sol.lam, M_w,
                                       sol.zl, sol.zu)
            jax.block_until_ready(u0s_w)
        w = (time.perf_counter() - t0) / reps
        best = w if best is None else min(best, w)
    it_w = float(jnp.mean(sol_w.iterations.astype(jnp.float32)))
    print(json.dumps({
        "B": B, "warm_solves_per_s": round(B / best, 1),
        "s_per_iter": round(best / max(it_w, 1), 4),
        "mean_iters": round(it_w, 2),
        "success": round(float(jnp.mean(
            sol_w.success.astype(jnp.float32))), 3),
        "compile_plus_first_s": round(t_cold, 1)}))


if __name__ == "__main__":
    main()
