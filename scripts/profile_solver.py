"""Component-level TPU timing of the batched NMPC solve hot path.

Times, per component, the pieces that make up one interior-point iteration
on the flagship robust-CSTR config (BENCH.md headline):

  full     one warm batched solve (throughput mode)
  sweep    the BBD band solve alone (Pallas kernel, realistic shapes)
  sweepG   the sweep at different chains-per-tile G
  prep     structured-prepare (derivatives + scatter assembly)
  evals    f/g/h/grad evaluations (the line-search / KKT-error inputs)

Prints one JSON line per measurement.  DOMPC_BENCH_B sets the batch.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, reps=5):
    out = fn()
    try:
        import jax
        jax.block_until_ready(out)
    except Exception:
        pass
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    import jax
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _build_cstr_mpc
    from dompc_tpu.parallel import make_batch_solver, initial_guess_from_x0

    B = int(os.environ.get("DOMPC_BENCH_B", "32"))
    mpc = _build_cstr_mpc(n_horizon=20, n_robust=1)
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    mpc.set_initial_guess()
    w0 = mpc.opt_x_num.copy()
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
    print(json.dumps({"what": "cold_compile_plus_first", "B": B,
                      "s": round(time.perf_counter() - t0, 2)}))

    X_w = X * (1.0 + 1e-3)
    M_w = jnp.full((B,), 1e-4, X.dtype)
    t_warm = timeit(lambda: solve_batch(X_w, sol.w, sol.lam, M_w, sol.zl,
                                        sol.zu)[1], reps=3)
    sol_w = solve_batch(X_w, sol.w, sol.lam, M_w, sol.zl, sol.zu)[0]
    it_w = float(jnp.mean(sol_w.iterations.astype(jnp.float32)))
    print(json.dumps({"what": "full_warm", "B": B, "s": round(t_warm, 4),
                      "solves_per_s": round(B / t_warm, 1),
                      "mean_iters": round(it_w, 2),
                      "s_per_iter": round(t_warm / max(it_w, 1), 4)}))

    # ---- condensed-path sub-pieces ------------------------------------------
    plan = mpc._condensation_plan()
    if plan is not None:
        asm = mpc._kkt_structure_cond
        I_n = mpc.n_instances
        n_ie = len(plan["int_cols"]) + len(plan["int_rows"])
        n_be = asm.n_ent
        key = jax.random.PRNGKey(0)
        M = jax.random.normal(key, (B, I_n, n_ie, n_ie)) \
            + 3.0 * jnp.eye(n_ie)
        RHS = jax.random.normal(key, (B, I_n, n_ie, n_be + 1))
        f_int = jax.jit(lambda m, r: jnp.linalg.solve(m, r))
        t_int = timeit(lambda: f_int(M, RHS))
        print(json.dumps({"what": "interior_batched_solve", "B": B,
                          "shape": [I_n, n_ie, n_be + 1],
                          "s": round(t_int, 4)}))
        from dompc_tpu.solver.batchqr import qr_solve, band_solve
        f_int2 = jax.jit(jax.vmap(qr_solve))
        t_int2 = timeit(lambda: f_int2(M, RHS))
        print(json.dumps({"what": "interior_lanes_qr", "B": B,
                          "s": round(t_int2, 4)}))
        Ci = jax.random.normal(key, (B, I_n, n_be, n_be))
        sigd = jnp.abs(jax.random.normal(key, (B, mpc.n_opt_x)))
        gdi = jnp.zeros((B, mpc.model.n_x))
        f_asm = jax.jit(jax.vmap(asm.assemble))
        t_asm = timeit(lambda: f_asm(Ci, sigd, gdi))
        print(json.dumps({"what": "condensed_assemble", "B": B,
                          "s": round(t_asm, 4)}))
        from dompc_tpu.solver.pallas_band import band_solve_qr_pallas
        C_, S_, b_, R_ = asm.C, asm.S, asm.b, asm.R
        Dc = jax.random.normal(key, (B * C_, S_, b_, b_),
                               dtype=jnp.float32) + 3 * jnp.eye(b_,
                                                                dtype=jnp.float32)
        Uc = jax.random.normal(key, (B * C_, S_ - 1, b_, b_),
                               dtype=jnp.float32)
        Lc = jax.random.normal(key, (B * C_, S_ - 1, b_, b_),
                               dtype=jnp.float32)
        rc = jax.random.normal(key, (B * C_, S_, b_, R_ + 1),
                               dtype=jnp.float32)
        f_sw = jax.jit(lambda d, u, l, a: band_solve_qr_pallas(d, u, l, a))
        t_sw = timeit(lambda: f_sw(Dc, Uc, Lc, rc))
        print(json.dumps({"what": "condensed_sweep", "B": B,
                          "chains": B * C_, "S": S_, "b": b_, "t": R_ + 1,
                          "s": round(t_sw, 4)}))
        f_sw2 = jax.jit(band_solve)
        t_sw2 = timeit(lambda: f_sw2(Dc, Uc, Lc, rc))
        print(json.dumps({"what": "condensed_sweep_lanes", "B": B,
                          "s": round(t_sw2, 4)}))

    # ---- condensed full prepare/solve on realistic data ---------------------
    ipm_delta = 1e-11
    if plan is not None:
        prep_c, solve_c = mpc._make_condensed_solve(ipm_delta)
        n_, m_, q_ = mpc.n_opt_x, mpc.n_opt_lagr, mpc._n_ineq
        base_pc = mpc._assemble_opt_p(x0)
        pvecs_c = jnp.asarray(np.tile(base_pc, (B, 1)))
        lam_gc = sol.lam[:, :m_]
        lam_hc = sol.lam[:, m_:]
        sig_c = jnp.abs(jnp.asarray(rng.standard_normal((B, n_)))) * 1e-2
        isig_c = jnp.abs(jnp.asarray(rng.standard_normal((B, q_)))) * 1e2
        prep_cv = jax.jit(jax.vmap(prep_c))
        ctx_c = prep_cv(sol.w, pvecs_c, lam_gc, lam_hc, sig_c, isig_c)
        t_prep_c = timeit(lambda: prep_cv(sol.w, pvecs_c, lam_gc, lam_hc,
                                          sig_c, isig_c))
        print(json.dumps({"what": "condensed_prepare", "B": B,
                          "s": round(t_prep_c, 4)}))
        rdw_c = jnp.asarray(rng.standard_normal((B, n_)))
        rg_c = jnp.asarray(rng.standard_normal((B, m_)))
        rh_c = jnp.asarray(rng.standard_normal((B, q_)))
        del_c = jnp.full((B,), 1e-8)
        solve_cv = jax.jit(jax.vmap(solve_c))
        t_solve_c = timeit(lambda: solve_cv(ctx_c, rdw_c, rg_c, rh_c,
                                            del_c))
        print(json.dumps({"what": "condensed_kkt_solve", "B": B,
                          "s": round(t_solve_c, 4)}))

    # ---- structured pieces on realistic data --------------------------------
    from dompc_tpu.solver.bbd import bbd_solve
    prepare, solve_ctx = mpc._make_structured_solve(ipm_delta)
    n, m, q = mpc.n_opt_x, mpc.n_opt_lagr, mpc._n_ineq
    base_p = mpc._assemble_opt_p(x0)
    pvecs = jnp.asarray(np.tile(base_p, (B, 1)))
    pvecs = pvecs.at[:, mpc._p_sl["x0"]].set(X)
    lam_g = sol.lam[:, :m]
    lam_h = sol.lam[:, m:]
    sig_w = jnp.abs(jnp.asarray(rng.standard_normal((B, n)))) * 1e-2
    inv_sig_s = jnp.abs(jnp.asarray(rng.standard_normal((B, q)))) * 1e2

    prep_v = jax.jit(jax.vmap(prepare))
    ctx = prep_v(sol.w, pvecs, lam_g, lam_h, sig_w, inv_sig_s)
    t_prep = timeit(lambda: prep_v(sol.w, pvecs, lam_g, lam_h, sig_w,
                                   inv_sig_s))
    C, S, b, R = ctx[3].shape[-4:]
    print(json.dumps({"what": "prepare", "B": B, "s": round(t_prep, 4),
                      "shape_CSbR": [C, S, b, R]}))

    r_dw = jnp.asarray(rng.standard_normal((B, n)))
    r_g = jnp.asarray(rng.standard_normal((B, m)))
    r_h = jnp.asarray(rng.standard_normal((B, q)))
    delta = jnp.full((B,), 1e-8)
    solve_v = jax.jit(jax.vmap(solve_ctx))
    t_solve = timeit(lambda: solve_v(ctx, r_dw, r_g, r_h, delta))
    print(json.dumps({"what": "kkt_solve(ctx)", "B": B,
                      "s": round(t_solve, 4)}))

    # sweep alone at several G
    D, U, Lo, Bord, Root = ctx
    aug = jnp.concatenate(
        [Bord, jnp.asarray(rng.standard_normal((B, C, S, b, 1)),
                           D.dtype)], axis=-1)
    from dompc_tpu.solver.pallas_band import band_solve_qr_pallas
    Df = D.reshape(B * C, S, b, b).astype(jnp.float32)
    Uf = U.reshape(B * C, S - 1, b, b).astype(jnp.float32)
    Lf = Lo.reshape(B * C, S - 1, b, b).astype(jnp.float32)
    t_aug = aug.shape[-1]
    augf = aug.reshape(B * C, S, b, t_aug).astype(jnp.float32)
    for G in (4, 8, 16):
        try:
            f = jax.jit(lambda d, u, l, a, G=G: band_solve_qr_pallas(
                d, u, l, a, chains_per_tile=G))
            t_sw = timeit(lambda: f(Df, Uf, Lf, augf))
            # Householder flops: per stage, b cols x (4*m*n_p mul-add)
            n_p = 3 * b + t_aug
            flops = B * C * S * b * 4 * (2 * b) * n_p
            print(json.dumps({
                "what": f"pallas_sweep G={G}", "B": B,
                "chains": B * C, "S": S, "b": b, "t": t_aug,
                "s": round(t_sw, 4),
                "gflops": round(flops / t_sw / 1e9, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"what": f"pallas_sweep G={G}",
                              "error": str(e)[:200]}))

    # ---- plain evaluations --------------------------------------------------
    f_fn, g_fn, h_fn = mpc._f_fn, mpc._g_fn, mpc._h_fn
    grad_f = mpc._grad_f_fn
    fv = jax.jit(jax.vmap(f_fn))
    gv = jax.jit(jax.vmap(g_fn))
    hv = jax.jit(jax.vmap(h_fn))
    gradv = jax.jit(jax.vmap(grad_f))
    for name, fn in (("f", lambda: fv(sol.w, pvecs)),
                     ("g", lambda: gv(sol.w, pvecs)),
                     ("h", lambda: hv(sol.w, pvecs)),
                     ("grad_f", lambda: gradv(sol.w, pvecs))):
        t = timeit(fn)
        print(json.dumps({"what": f"eval_{name}", "B": B,
                          "s": round(t, 5)}))


if __name__ == "__main__":
    main()
