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

from functools import partial

import jax
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
    """``band_solve_qr_lanes`` with a custom vmap rule: the outer solver
    batch flattens into the chain/lane batch (B chains of C each become
    one B*C-wide sweep)."""
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
