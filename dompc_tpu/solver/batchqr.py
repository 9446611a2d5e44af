"""Batch-in-lanes dense QR solves: many tiny systems, batch on the lane axis.

TPU profile (scripts/profile_solver.py, B=128 flagship): XLA's batched LU
(``jnp.linalg.solve``) on 23k systems of size 24 costs 162 ms — pivoting
serializes and the per-system matrices waste the vector lanes.  The
TPU-native layout flips the problem: tensors are (n, n_cols, N) with the
BATCH on the minor (lane) axis, so every Householder elimination step is a
handful of elementwise/reduction ops over N-wide vectors — the VPU
processes all N systems simultaneously and XLA fuses each column step.
Scaled Householder reflections are pivot-free with bounded growth
(float32-stable on barely-regularized interior-point blocks, same argument
as solver/pallas_band.py).  Pure XLA: the same code runs f32 on TPU and
f64 on CPU.

The reference delegates all such solves to IPOPT's sparse LU
(do_mpc/optimizer.py:731-787); this file is where its per-instance
pivoting work lands on the MXU/VPU instead.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import numpy as np
import jax.numpy as jnp


def _qr_eliminate_lanes(P, n_elim):
    """Householder-eliminate the first ``n_elim`` columns of P.

    P: (m, n_p, N) — m rows, n_p columns, batch N on lanes.  Returns the
    transformed P (R in the top-left (n_elim, n_elim), etc.).
    """
    m = P.shape[0]
    row = jnp.arange(m)[:, None]          # (m, 1) broadcast over lanes

    def col_step(j, P):
        col = jax.lax.dynamic_slice_in_dim(P, j, 1, axis=1)[:, 0, :]
        active = row >= j                  # (m, 1)
        xa = jnp.where(active, col, 0.0)
        # scale-invariant reflector (barrier diagonals reach 1e25 in f32)
        scale = jnp.max(jnp.abs(xa), axis=0)
        inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
        xs = xa * inv_scale[None, :]
        sigma = jnp.sum(xs * xs, axis=0)
        normx = jnp.sqrt(sigma)
        xj = jnp.sum(jnp.where(row == j, xs, 0.0), axis=0)
        sgn = jnp.where(xj >= 0, 1.0, -1.0)
        alpha = -sgn * normx
        v = jnp.where(row == j, xs - alpha[None, :], xs)     # (m, N)
        vtv = sigma - xj * xj + (xj - alpha) ** 2
        beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)
        w = jnp.einsum("rN,rcN->cN", v, P)                   # (n_p, N)
        return P - (beta[None, :] * v)[:, None, :] * w[None, :, :]

    return jax.lax.fori_loop(0, n_elim, col_step, P)


def _tri_solve_lanes(R, C):
    """Upper-triangular solve R x = C; R: (n, n, N), C: (n, t, N)."""
    n = R.shape[0]
    t = C.shape[1]
    N = R.shape[-1]
    colid = jnp.arange(n)[:, None]

    def row_step(i_rev, x):
        i = n - 1 - i_rev
        r_i = jax.lax.dynamic_slice_in_dim(R, i, 1, axis=0)[0]  # (n, N)
        above = jnp.where(colid > i, r_i, 0.0)
        acc = jnp.einsum("cN,ctN->tN", above, x)                # (t, N)
        d_i = jnp.sum(jnp.where(colid == i, r_i, 0.0), axis=0)
        d_i = jnp.where(jnp.abs(d_i) > 1e-30, d_i, 1e-30)
        c_i = jax.lax.dynamic_slice_in_dim(C, i, 1, axis=0)[0]  # (t, N)
        x_i = (c_i - acc) / d_i[None, :]
        return jax.lax.dynamic_update_slice_in_dim(
            x, x_i[None], i, axis=0)

    x0 = jnp.zeros((n, t, N), R.dtype)
    return jax.lax.fori_loop(0, n, row_step, x0)


def qr_solve_batched(A, B):
    """Solve A_i x_i = B_i for a large batch of small dense systems.

    A: (N, n, n); B: (N, n, t).  Returns (N, n, t).  Stable (Householder),
    pivot-free, batch-on-lanes — use instead of ``jnp.linalg.solve`` when
    N >> n (profiled 10x+ faster on TPU for N ~ 2e4, n ~ 24).
    """
    N, n, _ = A.shape
    t = B.shape[-1]
    P = jnp.concatenate([A, B], axis=2)       # (N, n, n+t)
    P = jnp.moveaxis(P, 0, -1)                # (n, n+t, N)
    P = _qr_eliminate_lanes(P, n)
    x = _tri_solve_lanes(P[:, :n, :], P[:, n:, :])
    return jnp.moveaxis(x, -1, 0)


@jax.custom_batching.custom_vmap
def qr_solve(A, B):
    """``qr_solve_batched`` with a custom vmap rule: an outer ``vmap``
    (e.g. the IPM solver's batch axis) FLATTENS into the lane batch
    instead of adding a leading loop axis, so all B x N systems share one
    wide elimination."""
    return qr_solve_batched(A, B)


@qr_solve.def_vmap
def _qr_solve_vmap(axis_size, in_batched, A, B):
    A_b, B_b = in_batched
    if not A_b:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not B_b:
        B = jnp.broadcast_to(B[None], (axis_size,) + B.shape)
    sa, sb = A.shape, B.shape
    out = qr_solve_batched(A.reshape((-1,) + sa[2:]),
                           B.reshape((-1,) + sb[2:]))
    return out.reshape(sb), True


def band_solve_qr_lanes(D, U, Lo, rhs):
    """Block-tridiagonal multi-RHS solve, batch-on-lanes formulation.

    Same math as ``bbd.band_solve_qr_multi`` / the Pallas sweep (banded QR:
    per stage an R-only QR of the stacked (2b, 3b+t) panel), but the chain
    batch N lives on the lane axis so each Householder column step is a
    few wide elementwise ops — no per-chain tiling, no Pallas, identical
    code for f32/f64.

    D: (N, S, b, b); U, Lo: (N, S-1, b, b); rhs: (N, S, b, t) →
    x: (N, S, b, t).
    """
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    dt = D.dtype
    # lanes-last stage tensors
    Dm = jnp.moveaxis(D, 0, -1)               # (S, b, b, N)
    rm = jnp.moveaxis(rhs, 0, -1)             # (S, b, t, N)
    if S > 1:
        Um = jnp.moveaxis(U, 0, -1)
        Lm = jnp.moveaxis(Lo, 0, -1)
    zero_bb = jnp.zeros((b, b, N), dt)

    def fwd_step(carry, inp):
        Dhat, Uhat, rhat = carry              # (b, b, N), (b, b, N), (b, t, N)
        L_k, D_n, U_n, r_n = inp
        top = jnp.concatenate([Dhat, Uhat, zero_bb, rhat], axis=1)
        bot = jnp.concatenate([L_k, D_n, U_n, r_n], axis=1)
        P = jnp.concatenate([top, bot], axis=0)    # (2b, 3b+t, N)
        P = _qr_eliminate_lanes(P, b)
        out = P[:b]                                # (R_k | B_k | C_k | c_k)
        return (P[b:, b:2 * b], P[b:, 2 * b:3 * b], P[b:, 3 * b:]), out

    init = (Dm[0], Um[0] if S > 1 else zero_bb, rm[0])
    if S > 1:
        U_ext = jnp.concatenate(
            [Um[1:], zero_bb[None]], axis=0) if S > 2 else zero_bb[None]
        (Dh, Uh, rh), F = jax.lax.scan(
            fwd_step, init, (Lm, Dm[1:], U_ext, rm[1:]))
    else:
        Dh, Uh, rh = init

    Pf = jnp.concatenate([Dh, rh], axis=1)        # (b, b+t, N)
    Pf = _qr_eliminate_lanes(Pf, b)
    x_last = _tri_solve_lanes(Pf[:, :b, :], Pf[:, b:, :])   # (b, t, N)

    if S == 1:
        return jnp.moveaxis(x_last, -1, 0)[:, None]

    def bwd_step(carry, Fk):
        x1, x2 = carry
        R_k = Fk[:, :b]
        B_k = Fk[:, b:2 * b]
        C_k = Fk[:, 2 * b:3 * b]
        c_k = Fk[:, 3 * b:]
        rhs_k = (c_k - jnp.einsum("rcN,ctN->rtN", B_k, x1)
                 - jnp.einsum("rcN,ctN->rtN", C_k, x2))
        x_k = _tri_solve_lanes(R_k, rhs_k)
        return (x_k, x1), x_k

    (x0_, _), xs_rev = jax.lax.scan(
        bwd_step, (x_last, jnp.zeros((b, t, N), dt)), F, reverse=True)
    xs = jnp.concatenate([xs_rev, x_last[None]], axis=0)   # (S, b, t, N)
    return jnp.moveaxis(xs, -1, 0)


@jax.custom_batching.custom_vmap
def band_solve(D, U, Lo, rhs):
    """Column-at-a-time lanes sweep with a custom vmap rule: the outer
    solver batch flattens into the chain/lane batch (B chains of C each
    become one B*C-wide sweep).  The blocked-WY variant
    (:func:`band_solve_qr_lanes_wy`, ~2.8x less theoretical panel
    traffic) was measured SLOWER in-loop on the flagship (38.4 vs
    32.9 ms/iter at B=128): XLA lowers the lanes-minor batched matmuls
    of the block application with relayouts, while the column loop's
    outer-product updates fuse as pure elementwise work over lanes.
    A/B via ``DOMPC_TPU_BAND_BACKEND=lanes_wy``."""
    return band_solve_qr_lanes(D, U, Lo, rhs)


@band_solve.def_vmap
def _band_solve_vmap(axis_size, in_batched, D, U, Lo, rhs):
    args = []
    for x, b in zip((D, U, Lo, rhs), in_batched):
        if not b:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args.append(x.reshape((-1,) + x.shape[2:]))
    out = band_solve_qr_lanes(*args)
    return out.reshape((axis_size, -1) + out.shape[1:]), True


@jax.custom_batching.custom_vmap
def band_solve_wy(D, U, Lo, rhs):
    """Blocked-WY lanes sweep (see band_solve docstring for the measured
    trade-off)."""
    return band_solve_qr_lanes_wy(D, U, Lo, rhs)


@band_solve_wy.def_vmap
def _band_solve_wy_vmap(axis_size, in_batched, D, U, Lo, rhs):
    args = []
    for x, b in zip((D, U, Lo, rhs), in_batched):
        if not b:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args.append(x.reshape((-1,) + x.shape[2:]))
    out = band_solve_qr_lanes_wy(*args)
    return out.reshape((axis_size, -1) + out.shape[1:]), True


# ---------------------------------------------------------------------------
# Blocked-WY stage step: one block reflector application per stage
# ---------------------------------------------------------------------------

def _qr_factor_wy_lanes(A, n_elim):
    """Householder-factor the first ``n_elim`` columns of ``A`` and
    accumulate the compact-WY representation.

    The plain column loop rewrites the WHOLE panel once per column —
    2·b panel passes per stage.  Factoring only the (m, n_elim) pivot
    panel column-by-column and returning (V, T) lets the caller update
    the trailing columns with ONE block application
    ``P - V Tᵀ (Vᵀ P)`` — the classic LAPACK blocked QR, here in the
    batch-on-lanes layout.  ``A``: (m, n_elim, N).  Returns
    (R_panel, V (m, n_elim, N), T (n_elim, n_elim, N)) with
    Q = I - V T Vᵀ (scaled reflectors, same scale-invariant form as
    :func:`_qr_eliminate_lanes`)."""
    m, n_e, N = A.shape
    row = jnp.arange(m)[:, None]
    kk = jnp.arange(n_e)[:, None]

    def col_step(j, carry):
        A, V, T = carry
        col = jax.lax.dynamic_slice_in_dim(A, j, 1, axis=1)[:, 0, :]
        active = row >= j
        xa = jnp.where(active, col, 0.0)
        scale = jnp.max(jnp.abs(xa), axis=0)
        inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
        xs = xa * inv_scale[None, :]
        sigma = jnp.sum(xs * xs, axis=0)
        normx = jnp.sqrt(sigma)
        xj = jnp.sum(jnp.where(row == j, xs, 0.0), axis=0)
        sgn = jnp.where(xj >= 0, 1.0, -1.0)
        alpha = -sgn * normx
        v = jnp.where(row == j, xs - alpha[None, :], xs)      # (m, N)
        vtv = sigma - xj * xj + (xj - alpha) ** 2
        beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)
        # update the remaining pivot columns only (cols < j have zeros
        # below the diagonal, so the reflector leaves them unchanged)
        w = jnp.einsum("rN,rcN->cN", v, A)
        A = A - (beta[None, :] * v)[:, None, :] * w[None, :, :]
        # T column j: T[:j, j] = -beta T[:j, :j] (V[:, :j]ᵀ v);
        # T[j, j] = beta  (V cols >= j are still zero -> safe full forms)
        u = jnp.einsum("rkN,rN->kN", V, v)
        tcol = -beta[None, :] * jnp.einsum("jkN,kN->jN", T, u)
        tcol = jnp.where(kk < j, tcol, jnp.where(kk == j, beta, 0.0))
        T = jax.lax.dynamic_update_slice_in_dim(
            T, tcol[:, None, :], j, axis=1)
        V = jax.lax.dynamic_update_slice_in_dim(
            V, v[:, None, :], j, axis=1)
        return A, V, T

    V0 = jnp.zeros((m, n_e, N), A.dtype)
    T0 = jnp.zeros((n_e, n_e, N), A.dtype)
    A, V, T = jax.lax.fori_loop(0, n_e, col_step, (A, V0, T0))
    return A, V, T


def _wy_apply_lanes(V, T, P):
    """Apply Qᵀ = (I - V T Vᵀ)ᵀ = I - V Tᵀ Vᵀ to ``P`` (m, c, N)."""
    W = jnp.einsum("rjN,rcN->jcN", V, P)
    Y = jnp.einsum("jkN,jcN->kcN", T, W)        # Tᵀ W
    return P - jnp.einsum("rkN,kcN->rcN", V, Y)


def band_solve_qr_lanes_wy(D, U, Lo, rhs):
    """:func:`band_solve_qr_lanes` with the per-stage elimination done as
    blocked WY: factor the (2b, b) pivot panel, then ONE block-reflector
    application to the (2b, 2b+t) trailing columns — ~2.8x less panel
    traffic per stage than the column-at-a-time full-panel rewrites.
    Identical math (scaled Householder QR), same backward pass."""
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    dt = D.dtype
    Dm = jnp.moveaxis(D, 0, -1)
    rm = jnp.moveaxis(rhs, 0, -1)
    if S > 1:
        Um = jnp.moveaxis(U, 0, -1)
        Lm = jnp.moveaxis(Lo, 0, -1)
    zero_bb = jnp.zeros((b, b, N), dt)

    def fwd_step(carry, inp):
        Dhat, Uhat, rhat = carry
        L_k, D_n, U_n, r_n = inp
        piv = jnp.concatenate([Dhat, L_k], axis=0)          # (2b, b, N)
        Rp, V, T = _qr_factor_wy_lanes(piv, b)
        trail = jnp.concatenate([
            jnp.concatenate([Uhat, zero_bb, rhat], axis=1),
            jnp.concatenate([D_n, U_n, r_n], axis=1)], axis=0)
        trail = _wy_apply_lanes(V, T, trail)                # (2b, 2b+t, N)
        R_k = Rp[:b]
        out = jnp.concatenate([R_k, trail[:b]], axis=1)     # (b, 3b+t, N)
        return (trail[b:, :b], trail[b:, b:2 * b],
                trail[b:, 2 * b:]), out

    init = (Dm[0], Um[0] if S > 1 else zero_bb, rm[0])
    if S > 1:
        U_ext = jnp.concatenate(
            [Um[1:], zero_bb[None]], axis=0) if S > 2 else zero_bb[None]
        (Dh, Uh, rh), F = jax.lax.scan(
            fwd_step, init, (Lm, Dm[1:], U_ext, rm[1:]))
    else:
        Dh, Uh, rh = init

    Pf = jnp.concatenate([Dh, rh], axis=1)
    Pf = _qr_eliminate_lanes(Pf, b)
    x_last = _tri_solve_lanes(Pf[:, :b, :], Pf[:, b:, :])

    if S == 1:
        return jnp.moveaxis(x_last, -1, 0)[:, None]

    def bwd_step(carry, Fk):
        x1, x2 = carry
        R_k = Fk[:, :b]
        B_k = Fk[:, b:2 * b]
        C_k = Fk[:, 2 * b:3 * b]
        c_k = Fk[:, 3 * b:]
        rhs_k = (c_k - jnp.einsum("rcN,ctN->rtN", B_k, x1)
                 - jnp.einsum("rcN,ctN->rtN", C_k, x2))
        x_k = _tri_solve_lanes(R_k, rhs_k)
        return (x_k, x1), x_k

    (x0_, _), xs_rev = jax.lax.scan(
        bwd_step, (x_last, jnp.zeros((b, t, N), dt)), F, reverse=True)
    xs = jnp.concatenate([xs_rev, x_last[None]], axis=0)
    return jnp.moveaxis(xs, -1, 0)


# ---------------------------------------------------------------------------
# Partitioned (SPIKE-QR) band solve: trade sequential depth for lane batch
# ---------------------------------------------------------------------------

def band_solve_spike_impl(D, U, Lo, rhs, n_parts, sweep=None):
    """Block-tridiagonal solve with nested-dissection partitioning.

    The sequential QR sweep's wall time is depth-bound (S stages × b
    Householder columns of small-panel latency).  Partition each chain's
    stages into ``n_parts`` segments separated by single separator
    stages; eliminate all segment interiors IN PARALLEL (one lanes sweep
    over an ``n_parts``-times-larger batch, carrying the two separator
    couplings as 2b extra RHS columns), solve the small reduced
    block-tridiagonal system over the separators, and recover interiors
    by matmuls — no second sweep.  Stability: every elimination is the
    same scaled-Householder QR as the plain sweep; the substitutions are
    bounded by the segment solution operators.

    D: (N, S, b, b); U, Lo: (N, S-1, b, b); rhs: (N, S, b, t).
    Returns (N, S, b, t).
    """
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    dt = D.dtype
    P = n_parts
    if P < 2 or S < 2 * P - 1:
        # fewer than one interior stage per segment: partitioning is
        # meaningless (callers should route to the plain sweep; guarded
        # here too so a forced DOMPC_TPU_SPIKE cannot produce a size-0
        # segment axis and an opaque trace-time IndexError)
        return band_solve_qr_lanes(D, U, Lo, rhs)
    L = -(-(S - (P - 1)) // P)          # ceil segment length
    S_pad = P * L + (P - 1)
    if S_pad > S:                        # pad identity stages at the end
        padn = S_pad - S
        eye = jnp.broadcast_to(jnp.eye(b, dtype=dt), (N, padn, b, b))
        D = jnp.concatenate([D, eye], axis=1)
        zpad = jnp.zeros((N, padn, b, b), dt)
        U = jnp.concatenate([U, zpad], axis=1)[:, :S_pad - 1]
        Lo = jnp.concatenate([Lo, zpad], axis=1)[:, :S_pad - 1]
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((N, padn, b, t), dt)], axis=1)

    seg_idx = (np.arange(P)[:, None] * (L + 1)
               + np.arange(L)[None, :])            # (P, L) interior stages
    sep_idx = L + np.arange(P - 1) * (L + 1)       # (P-1,) separator stages
    a = seg_idx[:, 0]                              # segment starts

    D_seg = D[:, seg_idx]                          # (N, P, L, b, b)
    U_seg = U[:, seg_idx[:, :L - 1]] if L > 1 else \
        jnp.zeros((N, P, 0, b, b), dt)
    Lo_seg = Lo[:, seg_idx[:, :L - 1]] if L > 1 else \
        jnp.zeros((N, P, 0, b, b), dt)
    rhs_seg = rhs[:, seg_idx]                      # (N, P, L, b, t)

    # separator couplings into each segment (zero at the outer ends)
    leftC = jnp.concatenate([
        jnp.zeros((N, 1, b, b), dt), Lo[:, a[1:] - 1]], axis=1)
    rightC = jnp.concatenate([
        U[:, a[:-1] + L - 1], jnp.zeros((N, 1, b, b), dt)], axis=1)

    aug = jnp.zeros((N, P, L, b, 2 * b + t), dt)
    aug = aug.at[:, :, 0, :, :b].set(leftC)
    aug = aug.at[:, :, L - 1, :, b:2 * b].set(rightC)
    aug = aug.at[:, :, :, :, 2 * b:].set(rhs_seg)

    # the segment sweep dominates (N*P chains of L stages); ``sweep``
    # lets the caller route it through the Pallas lanes kernel.  The
    # small reduced separator solve below stays on the XLA sweep.
    seg_sweep = sweep or band_solve_qr_lanes
    flat = lambda x: x.reshape((N * P,) + x.shape[2:])
    Y = seg_sweep(flat(D_seg), flat(U_seg), flat(Lo_seg),
                  flat(aug)).reshape(N, P, L, b, 2 * b + t)
    YL = Y[..., :b]                                # (N, P, L, b, b)
    YR = Y[..., b:2 * b]
    ys = Y[..., 2 * b:]                            # (N, P, L, b, t)

    # reduced block-tridiagonal system over the P-1 separators
    Lo_l = Lo[:, sep_idx - 1]                      # (N, P-1, b, b)
    U_r = U[:, sep_idx]
    lastYL = YL[:, :P - 1, L - 1]                  # segment j, last row
    lastYR = YR[:, :P - 1, L - 1]
    last_y = ys[:, :P - 1, L - 1]
    firstYL = YL[:, 1:, 0]                         # segment j+1, first row
    firstYR = YR[:, 1:, 0]
    first_y = ys[:, 1:, 0]
    mm = partial(jnp.einsum, "nkij,nkjl->nkil")
    D_red = (D[:, sep_idx] - mm(Lo_l, lastYR) - mm(U_r, firstYL))
    U_red = -mm(U_r, firstYR)[:, :P - 2] if P > 2 else \
        jnp.zeros((N, 0, b, b), dt)
    Lo_red = -mm(Lo_l, lastYL)[:, 1:] if P > 2 else \
        jnp.zeros((N, 0, b, b), dt)
    b_red = (rhs[:, sep_idx] - mm(Lo_l, last_y) - mm(U_r, first_y))
    x_sep = band_solve_qr_lanes(D_red, U_red, Lo_red, b_red)

    # recover segment interiors: x = y - YL x_leftsep - YR x_rightsep
    zsep = jnp.zeros((N, 1, b, t), dt)
    xs_l = jnp.concatenate([zsep, x_sep], axis=1)  # left sep of segment i
    xs_r = jnp.concatenate([x_sep, zsep], axis=1)  # right sep of segment i
    x_seg = (ys
             - jnp.einsum("npLbc,npct->npLbt", YL, xs_l)
             - jnp.einsum("npLbc,npct->npLbt", YR, xs_r))

    x = jnp.zeros((N, S_pad, b, t), dt)
    x = x.at[:, seg_idx].set(x_seg)
    x = x.at[:, sep_idx].set(x_sep)
    return x[:, :S]


@lru_cache(maxsize=None)
def _spike_fn(n_parts, use_pallas=False):
    if use_pallas:
        from .pallas_band import band_solve_qr_pallas_lanes, _lane_tile

        def seg_sweep(D, U, Lo, rhs):
            return band_solve_qr_pallas_lanes(D, U, Lo, rhs,
                                              lane_tile=_lane_tile())
    else:
        seg_sweep = None

    @jax.custom_batching.custom_vmap
    def f(D, U, Lo, rhs):
        return band_solve_spike_impl(D, U, Lo, rhs, n_parts,
                                     sweep=seg_sweep)

    @f.def_vmap
    def _rule(axis_size, in_batched, D, U, Lo, rhs):  # noqa: ANN001
        args = []
        for x, bt in zip((D, U, Lo, rhs), in_batched):
            if not bt:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x.reshape((-1,) + x.shape[2:]))
        out = band_solve_spike_impl(*args, n_parts, sweep=seg_sweep)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def band_solve_spike(D, U, Lo, rhs, n_parts=3, use_pallas=False):
    """Partitioned sweep with the same outer-vmap flattening rule as
    :func:`band_solve` (the static ``n_parts``/``use_pallas`` select a
    cached custom-vmap instance)."""
    return _spike_fn(n_parts, use_pallas)(D, U, Lo, rhs)
