"""Condensed-band KKT backend equivalence: the Schur-eliminated
(gather-assembled) condensed solve must agree with the plain structured
band solve on the same Newton system (f64).  Pins the gather-form
assembly plan in solver/bbd.py:CondensedAssembler."""
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_cstr_mpc


def test_condensed_matches_plain_band():
    mpc = _build_cstr_mpc(n_horizon=6, n_robust=1)
    assert mpc._condensation_plan() is not None

    delta_cons = 1e-8
    prep_c, solve_c = mpc._make_condensed_solve(delta_cons)
    prep_p, solve_p = mpc._make_structured_solve(delta_cons)

    n, m, q = mpc.n_opt_x, mpc.n_opt_lagr, mpc._n_ineq
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    mpc.set_initial_guess()
    w = jnp.asarray(mpc.opt_x_num)
    pvec = jnp.asarray(mpc._assemble_opt_p(x0))
    rng = np.random.default_rng(0)
    lam_g = jnp.asarray(rng.standard_normal(m) * 0.1)
    lam_h = jnp.asarray(np.abs(rng.standard_normal(q)) * 0.1)
    sig_w = jnp.asarray(np.abs(rng.standard_normal(n)) * 1e-2)
    inv_sig_s = jnp.asarray(np.abs(rng.standard_normal(q)) * 1e2)
    r_dw = jnp.asarray(rng.standard_normal(n))
    r_g = jnp.asarray(rng.standard_normal(m))
    r_h = jnp.asarray(rng.standard_normal(q))
    delta = jnp.asarray(1e-8)

    ctx_c = prep_c(w, pvec, lam_g, lam_h, sig_w, inv_sig_s)
    dw_c, dg_c, dh_c = solve_c(ctx_c, r_dw, r_g, r_h, delta)
    ctx_p = prep_p(w, pvec, lam_g, lam_h, sig_w, inv_sig_s)
    dw_p, dg_p, dh_p = solve_p(ctx_p, r_dw, r_g, r_h, delta)

    scale = float(jnp.max(jnp.abs(dw_p))) + 1.0
    assert float(jnp.max(jnp.abs(dw_c - dw_p))) / scale < 1e-9
    assert float(jnp.max(jnp.abs(dg_c - dg_p))) / (
        float(jnp.max(jnp.abs(dg_p))) + 1.0) < 1e-9
    if q:
        assert float(jnp.max(jnp.abs(dh_c - dh_p))) / (
            float(jnp.max(jnp.abs(dh_p))) + 1.0) < 1e-9


def test_assemble_scatter_gather_equivalence(monkeypatch):
    """The scatter-add and two-tier gather assembly backends must produce
    identical band tensors (f64; summation-order differences only)."""
    mpc = _build_cstr_mpc(n_horizon=4, n_robust=1)
    mpc._make_condensed_solve(1e-8)
    asm = mpc._kkt_structure_cond
    rng = np.random.default_rng(1)
    I, n_ent = asm.ent_pair_idx.shape[:2]
    C_i = jnp.asarray(rng.standard_normal((I, n_ent, n_ent)))
    sig = jnp.asarray(np.abs(rng.standard_normal(mpc.n_opt_x)))
    gdi = jnp.asarray(-1e-8 * np.ones(mpc.model.n_x))

    monkeypatch.delenv("DOMPC_TPU_ASSEMBLE", raising=False)
    out_g = asm.assemble(C_i, sig, gdi)
    monkeypatch.setenv("DOMPC_TPU_ASSEMBLE", "scatter")
    out_s = asm.assemble(C_i, sig, gdi)
    for a, b in zip(out_g, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-13, atol=1e-13)
