"""Pallas TPU kernel: batched block-tridiagonal QR sweep.

The BBD chain solve (solver/bbd.py) is the per-iteration hot op of the
interior-point method.  Expressed as ``lax.scan`` over stages with
``jnp.linalg.qr`` panels, each of the S sequential XLA QR calls costs
milliseconds on TPU (LAPACK-style Householder lowers to a long chain of
small ops), so the sweep is latency-bound, not flop-bound.  This kernel
runs the ENTIRE sweep — forward banded-QR elimination and backward
substitution — as one ``pallas_call``: panels live in VMEM, the
Householder column loop vectorizes across a tile of chains, and no
per-stage XLA dispatch remains.

Math is identical to ``bbd.band_solve_qr_multi``: at stage k an R-only QR
of the augmented panel

    [ Dhat  Uhat  0     rhat ]     rows 0..b-1   (carry)
    [ L_k   D_k+1 U_k+1 r_k+1]     rows b..2b-1  (next stage)

eliminates the first b columns; the top b rows yield (R_k, B_k, C_k, c_k)
and the bottom b rows become the next carry.  Back substitution:
x_k = R_k^{-1} (c_k - B_k x_{k+1} - C_k x_{k+2}).  Orthogonal elimination
has bounded growth — float32-stable on barely-regularized IPM KKT systems.
(The reference delegates this solve to IPOPT's MUMPS/MA27,
do_mpc/optimizer.py:731-787; stage-bandedness is the TPU-native substitute
for their sparse pivoting.)

Lowering notes: everything vectorizes over the chain tile G as a leading
dim; contractions are written as broadcast-multiply + sum over the sublane
axis (no batched dot_general), dynamic column extraction as a masked lane
reduction, and Householder vector construction as a masked select — the
constructs Mosaic lowers well.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_sweep_kernel(D_ref, U_ref, Lo_ref, rhs_ref, x_ref, Rs, Bs, Cs,
                       cs, *, S, b, t):
    """One grid program solves a tile of G chains entirely in VMEM.

    Shapes (G = chains per program): D (G,S,b,b); U, Lo (G,S-1,b,b) padded
    to at least 1 slot; rhs (G,S,b,t); out x (G,S,b,t); scratch Rs/Bs/Cs
    (G,S,b,b) and cs (G,S,b,t) hold the per-stage factors.
    """
    G = D_ref.shape[0]
    m = 2 * b
    n_p = 3 * b + t
    f32 = jnp.float32

    row_id = jax.lax.broadcasted_iota(jnp.int32, (G, m), 1)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (G, m, n_p), 2)

    def qr_eliminate(P, n_elim):
        """Householder-eliminate the first n_elim columns of P (G,m,n_p)."""

        def col_step(j, P):
            # column j via masked lane reduction (no dynamic lane gather)
            col = jnp.sum(jnp.where(lane_id == j, P, 0.0), axis=2)  # (G,m)
            active = row_id >= j
            xa = jnp.where(active, col, 0.0)
            sigma = jnp.sum(xa * xa, axis=1)                        # (G,)
            normx = jnp.sqrt(sigma)
            xj = jnp.sum(jnp.where(row_id == j, col, 0.0), axis=1)  # (G,)
            sgn = jnp.where(xj >= 0, 1.0, -1.0)
            alpha = -sgn * normx
            v = jnp.where(row_id == j, xa - alpha[:, None], xa)    # (G,m)
            vtv = sigma - xj * xj + (xj - alpha) ** 2
            beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)          # (G,)
            wrow = jnp.sum(v[:, :, None] * P, axis=1)              # (G,n_p)
            P = P - (beta[:, None] * v)[:, :, None] * wrow[:, None, :]
            return P

        return jax.lax.fori_loop(0, n_elim, col_step, P,
                                 unroll=False)

    tri_col = jax.lax.broadcasted_iota(jnp.int32, (G, b), 1)

    def tri_solve(R, c):
        """Upper-triangular solve R x = c; R (G,b,b), c (G,b,t)."""

        def row_step(i_rev, x):
            i = b - 1 - i_rev
            Ri = jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (G, b, b), 1) == i,
                R, 0.0), axis=1)                                   # (G,b)
            above = jnp.where(tri_col > i, Ri, 0.0)
            acc = jnp.sum(above[:, :, None] * x, axis=1)           # (G,t)
            di = jnp.sum(jnp.where(tri_col == i, Ri, 0.0), axis=1)
            di = jnp.where(jnp.abs(di) > 1e-30, di, 1e-30)
            # row i of c via masked reduction (values can't dynamic-slice)
            ci = jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, c.shape, 1) == i,
                c, 0.0), axis=1)
            xi = (ci - acc) / di[:, None]
            return jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (G, b, t), 1) == i,
                xi[:, None, :], x)

        x0 = jnp.zeros((G, b, t), f32)
        return jax.lax.fori_loop(0, b, row_step, x0, unroll=False)

    def bmm(A, x):
        """(G,b,b) @ (G,b,t) contraction over the middle axis."""
        return jnp.sum(A[:, :, :, None] * x[:, None, :, :], axis=2)

    # ---- forward elimination ----
    zeros_bb = jnp.zeros((G, b, b), f32)

    def fwd(k, carry):
        Dhat, Uhat, rhat = carry
        L_k = Lo_ref[:, k - 1]
        D_n = D_ref[:, k]
        U_n = jnp.where(k < S - 1, U_ref[:, jnp.minimum(k, S - 2)],
                        zeros_bb)
        r_n = rhs_ref[:, k]
        top = jnp.concatenate([Dhat, Uhat, zeros_bb, rhat], axis=2)
        bot = jnp.concatenate([L_k, D_n, U_n, r_n], axis=2)
        P = jnp.concatenate([top, bot], axis=1)                # (G,m,n_p)
        P = qr_eliminate(P, b)
        Rs[:, k - 1] = P[:, :b, :b]
        Bs[:, k - 1] = P[:, :b, b:2 * b]
        Cs[:, k - 1] = P[:, :b, 2 * b:3 * b]
        cs[:, k - 1] = P[:, :b, 3 * b:]
        return (P[:, b:, b:2 * b], P[:, b:, 2 * b:3 * b],
                P[:, b:, 3 * b:])

    Dhat = D_ref[:, 0]
    Uhat = U_ref[:, 0] if S > 1 else zeros_bb
    rhat = rhs_ref[:, 0]
    if S > 1:
        Dhat, Uhat, rhat = jax.lax.fori_loop(1, S, fwd,
                                             (Dhat, Uhat, rhat))

    # ---- final stage: triangularize (Dhat | rhat), rows padded to m ----
    Pf = jnp.concatenate(
        [jnp.concatenate([Dhat, rhat], axis=2),
         jnp.zeros((G, b, b + t), f32)], axis=1)               # (G,m,b+t)
    Pf = jnp.concatenate([Pf, jnp.zeros((G, m, n_p - (b + t)), f32)],
                         axis=2)
    Pf = qr_eliminate(Pf, b)
    x_last = tri_solve(Pf[:, :b, :b], Pf[:, :b, b:b + t])
    x_ref[:, S - 1] = x_last

    # ---- back substitution ----
    def bwd(i, carry):
        x1, x2 = carry                          # x_{k+1}, x_{k+2}
        k = S - 2 - i
        rhs_k = cs[:, k] - bmm(Bs[:, k], x1) - bmm(Cs[:, k], x2)
        x_k = tri_solve(Rs[:, k], rhs_k)
        x_ref[:, k] = x_k
        return (x_k, x1)

    if S > 1:
        jax.lax.fori_loop(0, S - 1, bwd,
                          (x_last, jnp.zeros((G, b, t), f32)))


@functools.partial(jax.jit, static_argnames=("chains_per_tile",
                                             "interpret"))
def band_solve_qr_pallas(D, U, Lo, rhs, chains_per_tile=8,
                         interpret=False):
    """Solve N independent block-tridiagonal systems with t RHS columns.

    D: (N, S, b, b); U, Lo: (N, S-1, b, b); rhs: (N, S, b, t).
    Returns x: (N, S, b, t) float32.  N is padded up to the tile size.
    """
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    G = min(chains_per_tile, N)
    pad = (-N) % G
    if pad:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype),
                               (pad, S, b, b))
        D = jnp.concatenate([D, eye], axis=0)
        U = jnp.concatenate(
            [U, jnp.zeros((pad,) + U.shape[1:], U.dtype)], axis=0)
        Lo = jnp.concatenate(
            [Lo, jnp.zeros((pad,) + Lo.shape[1:], Lo.dtype)], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad,) + rhs.shape[1:], rhs.dtype)], axis=0)
    Np = N + pad

    if S > 1:
        u_in, lo_in = U, Lo
    else:
        u_in = jnp.zeros((Np, 1, b, b), D.dtype)
        lo_in = jnp.zeros((Np, 1, b, b), D.dtype)
    s_off = max(S - 1, 1)

    spec4 = lambda s1: pl.BlockSpec((G, s1, b, b),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((G, S, b, t), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_band_sweep_kernel, S=S, b=b, t=t),
        out_shape=jax.ShapeDtypeStruct((Np, S, b, t), jnp.float32),
        grid=(Np // G,),
        in_specs=[spec4(S), spec4(s_off), spec4(s_off), spec_r],
        out_specs=spec_r,
        scratch_shapes=[
            pltpu.VMEM((G, S, b, b), jnp.float32),
            pltpu.VMEM((G, S, b, b), jnp.float32),
            pltpu.VMEM((G, S, b, b), jnp.float32),
            pltpu.VMEM((G, S, b, t), jnp.float32),
        ],
        interpret=interpret,
    )(D.astype(jnp.float32), u_in.astype(jnp.float32),
      lo_in.astype(jnp.float32), rhs.astype(jnp.float32))
    return out[:N]
