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

Lowering/VMEM notes: TPU tiles pad the last dim to 128 lanes, so (b, b)
blocks with b ~ 37 would waste 3.5x VMEM.  All per-stage blocks are
therefore packed into one wide row-block ``[L | D | U | rhs]`` of width
3b+t (~123 -> 128, 4% padding): one packed input, one packed factor
scratch.  Contractions are broadcast-multiply + sublane reductions (no
batched dot_general) and dynamic column extraction is a masked lane
reduction — the constructs Mosaic lowers well.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _band_sweep_kernel(Pin_ref, x_ref, F_ref, *, S, b, t):
    """One grid program solves a tile of G chains entirely in VMEM.

    Pin (G, S, b, 3b+t): per stage the packed rows [L_{k-1}, D_k, U_k,
    r_k] (L_{-1} = 0, U_{S-1} = 0).  Out x (G, S, b, t).  Scratch F
    (G, S, b, 3b+t) stores the per-stage factors [R_k, B_k, C_k, c_k].
    """
    G = Pin_ref.shape[0]
    m = 2 * b
    n_p = 3 * b + t
    f32 = jnp.float32

    row_id = jax.lax.broadcasted_iota(jnp.int32, (G, m), 1)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (G, m, n_p), 2)

    def qr_eliminate(P):
        """Householder-eliminate the first b columns of P (G, m, n_p)."""

        def col_step(j, P):
            # column j via masked lane reduction (no dynamic lane gather)
            col = jnp.sum(jnp.where(lane_id == j, P, 0.0), axis=2)  # (G,m)
            active = row_id >= j
            xa = jnp.where(active, col, 0.0)
            # scaled Householder: barrier diagonals reach ~1e25, so the
            # naive sum of squares overflows float32; the reflector
            # (I - beta v v^T) is scale-invariant in v, so compute it from
            # the column normalized by its max magnitude (LAPACK-style)
            scale = jnp.max(jnp.abs(xa), axis=1)                    # (G,)
            inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
            xs = xa * inv_scale[:, None]
            sigma = jnp.sum(xs * xs, axis=1)                        # (G,)
            normx = jnp.sqrt(sigma)
            xj = jnp.sum(jnp.where(row_id == j, xs, 0.0), axis=1)   # (G,)
            sgn = jnp.where(xj >= 0, 1.0, -1.0)
            alpha = -sgn * normx
            v = jnp.where(row_id == j, xs - alpha[:, None], xs)     # (G,m)
            vtv = sigma - xj * xj + (xj - alpha) ** 2
            beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)           # (G,)
            wrow = jnp.sum(v[:, :, None] * P, axis=1)               # (G,n_p)
            return P - (beta[:, None] * v)[:, :, None] * wrow[:, None, :]

        return jax.lax.fori_loop(0, b, col_step, P, unroll=False)

    tri_col = jax.lax.broadcasted_iota(jnp.int32, (G, b), 1)
    tri_row = jax.lax.broadcasted_iota(jnp.int32, (G, b, b), 1)
    c_row = jax.lax.broadcasted_iota(jnp.int32, (G, b, t), 1)

    def tri_solve(R, c):
        """Upper-triangular solve R x = c; R (G,b,b), c (G,b,t)."""

        def row_step(i_rev, x):
            i = b - 1 - i_rev
            Ri = jnp.sum(jnp.where(tri_row == i, R, 0.0), axis=1)  # (G,b)
            above = jnp.where(tri_col > i, Ri, 0.0)
            acc = jnp.sum(above[:, :, None] * x, axis=1)           # (G,t)
            di = jnp.sum(jnp.where(tri_col == i, Ri, 0.0), axis=1)
            di = jnp.where(jnp.abs(di) > 1e-30, di, 1e-30)
            ci = jnp.sum(jnp.where(c_row == i, c, 0.0), axis=1)    # (G,t)
            xi = (ci - acc) / di[:, None]
            return jnp.where(c_row == i, xi[:, None, :], x)

        x0 = jnp.zeros((G, b, t), f32)
        return jax.lax.fori_loop(0, b, row_step, x0, unroll=False)

    def bmm(A, x):
        """(G,b,b) @ (G,b,t) contraction over the middle axis."""
        return jnp.sum(A[:, :, :, None] * x[:, None, :, :], axis=2)

    zeros_bb = jnp.zeros((G, b, b), f32)

    # ---- forward elimination ----
    def fwd(k, carry):
        Dhat, Uhat, rhat = carry
        top = jnp.concatenate([Dhat, Uhat, zeros_bb, rhat], axis=2)
        bot = Pin_ref[:, k]                                  # (G,b,n_p)
        P = jnp.concatenate([top, bot], axis=1)              # (G,m,n_p)
        P = qr_eliminate(P)
        F_ref[:, k - 1] = P[:, :b, :]
        return (P[:, b:, b:2 * b], P[:, b:, 2 * b:3 * b],
                P[:, b:, 3 * b:])

    P0 = Pin_ref[:, 0]
    Dhat, Uhat, rhat = (P0[:, :, b:2 * b], P0[:, :, 2 * b:3 * b],
                        P0[:, :, 3 * b:])
    if S > 1:
        Dhat, Uhat, rhat = jax.lax.fori_loop(1, S, fwd,
                                             (Dhat, Uhat, rhat))

    # ---- final stage: triangularize (Dhat | rhat), rows padded to m ----
    Pf = jnp.concatenate([Dhat, jnp.zeros((G, b, b), f32), zeros_bb,
                          rhat], axis=2)
    Pf = jnp.concatenate([Pf, jnp.zeros((G, b, n_p), f32)], axis=1)
    Pf = qr_eliminate(Pf)
    x_last = tri_solve(Pf[:, :b, :b], Pf[:, :b, 3 * b:])
    x_ref[:, S - 1] = x_last

    # ---- back substitution ----
    def bwd(i, carry):
        x1, x2 = carry                          # x_{k+1}, x_{k+2}
        k = S - 2 - i
        Fk = F_ref[:, k]                                     # (G,b,n_p)
        rhs_k = (Fk[:, :, 3 * b:]
                 - bmm(Fk[:, :, b:2 * b], x1)
                 - bmm(Fk[:, :, 2 * b:3 * b], x2))
        x_k = tri_solve(Fk[:, :, :b], rhs_k)
        x_ref[:, k] = x_k
        return (x_k, x1)

    if S > 1:
        jax.lax.fori_loop(0, S - 1, bwd,
                          (x_last, jnp.zeros((G, b, t), f32)))


# ---------------------------------------------------------------------------
# Lanes-layout kernel (the b~13 retile): chains on the 128-lane axis
# ---------------------------------------------------------------------------
#
# Why the tiled kernel above loses at b=13 (BENCH.md: 69 ms vs the XLA
# lanes sweep's 9 ms at B=128): it puts G=4 chains on sublanes and the
# packed panel (width 3b+t ~ 51) on lanes — 60% of every lane tile is
# padding, and each Householder column step is a chain-tiny op.  The XLA
# lanes formulation (solver/batchqr.py) fixes the layout — batch on lanes,
# every column step a few wide VPU ops — but XLA cannot keep the 6 MB
# panel live across `fori_loop` iterations, so each of the S*b column
# steps round-trips the panel through HBM (~2x off bandwidth-bound,
# BENCH.md per-iteration profile).  This kernel uses the SAME lanes
# layout INSIDE Pallas: a 128-chain lane tile's panel and all its stage
# factors stay resident in VMEM for the whole forward sweep and backward
# substitution; HBM traffic drops to one streamed read of the packed
# stages plus the solution write.
#
# Layout per lane tile (NT=128 chains): stage panels (b, 3b+t, NT) are
# streamed in by the (tile, stage) grid; the factor buffer
# (S-1, b, 3b+t, NT) lives in VMEM scratch (6.8 MB at the flagship's
# S=21, b=13, t=12); the carry [Dhat|Uhat|rhat] is a (b, 2b+t, NT)
# scratch.  The elimination/substitution helpers are shared with the XLA
# lanes sweep (same scaled-Householder math, identical results).


def _qr_eliminate_lanes_mosaic(P, n_elim):
    """``batchqr._qr_eliminate_lanes`` with masked-iota indexing instead
    of ``dynamic_slice`` (unsupported in the Mosaic TPU lowering).  Same
    math, same results."""
    m, n_p, NT = P.shape
    row2 = jax.lax.broadcasted_iota(jnp.int32, (m, NT), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (m, n_p, NT), 1)

    def col_step(j, P):
        col = jnp.sum(jnp.where(colid == j, P, 0.0), axis=1)   # (m, NT)
        active = row2 >= j
        xa = jnp.where(active, col, 0.0)
        scale = jnp.max(jnp.abs(xa), axis=0, keepdims=True)    # (1, NT)
        inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
        xs = xa * inv_scale
        sigma = jnp.sum(xs * xs, axis=0, keepdims=True)
        normx = jnp.sqrt(sigma)
        xj = jnp.sum(jnp.where(row2 == j, xs, 0.0), axis=0,
                     keepdims=True)
        sgn = jnp.where(xj >= 0, 1.0, -1.0)
        alpha = -sgn * normx
        v = jnp.where(row2 == j, xs - alpha, xs)               # (m, NT)
        vtv = sigma - xj * xj + (xj - alpha) ** 2
        beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0)          # (1, NT)
        w = jnp.sum(v[:, None, :] * P, axis=0)                 # (n_p, NT)
        return P - (beta * v)[:, None, :] * w[None, :, :]

    return jax.lax.fori_loop(0, n_elim, col_step, P)


def _tri_solve_lanes_mosaic(R, C):
    """Masked-iota upper-triangular solve; R (n, n, NT), C (n, t, NT)."""
    n, _, NT = R.shape
    t = C.shape[1]
    colid2 = jax.lax.broadcasted_iota(jnp.int32, (n, NT), 0)
    rowR = jax.lax.broadcasted_iota(jnp.int32, (n, n, NT), 0)
    rowC = jax.lax.broadcasted_iota(jnp.int32, (n, t, NT), 0)

    def row_step(i_rev, x):
        i = n - 1 - i_rev
        r_i = jnp.sum(jnp.where(rowR == i, R, 0.0), axis=0)    # (n, NT)
        above = jnp.where(colid2 > i, r_i, 0.0)
        acc = jnp.sum(above[:, None, :] * x, axis=0)           # (t, NT)
        d_i = jnp.sum(jnp.where(colid2 == i, r_i, 0.0), axis=0,
                      keepdims=True)
        d_i = jnp.where(jnp.abs(d_i) > 1e-30, d_i, 1e-30)
        c_i = jnp.sum(jnp.where(rowC == i, C, 0.0), axis=0)    # (t, NT)
        x_i = (c_i - acc) / d_i
        return jnp.where(rowC == i, x_i[None, :, :], x)

    return jax.lax.fori_loop(0, n, row_step,
                             jnp.zeros((n, t, NT), R.dtype))


def _bmm_lanes(A, x):
    """sum_c A[r, c, N] * x[c, t, N] as broadcast-mul + sublane reduce
    (general lanes-minor ``dot_general`` does not lower well in Mosaic)."""
    return jnp.sum(A[:, :, None, :] * x[None, :, :, :], axis=1)


def _band_fwd_kernel(Pin_ref, F_ref, Cf_ref, carry_ref, *, S, b, t):
    """Forward elimination; grid (n_tiles, S), stage k innermost.

    Pin block (1, b, 3b+t, NT) streams stage k in; F block
    (1, b, 3b+t, NT) streams the stage factors out (the BlockSpec
    index_map does the stage addressing — Mosaic has no dynamic VMEM
    indexing); Cf (b, 2b+t, NT) carries the final [Dhat|Uhat|rhat] out.
    """
    NT = Pin_ref.shape[-1]
    f32 = Pin_ref.dtype
    k = pl.program_id(1)
    Pk = Pin_ref[0]                                    # (b, 3b+t, NT)

    @pl.when(k == 0)
    def _init():
        # carry <- [D_0 | U_0 | r_0] (drop the L slot, zero at stage 0)
        carry_ref[:, :2 * b, :] = Pk[:, b:3 * b, :]
        carry_ref[:, 2 * b:, :] = Pk[:, 3 * b:, :]

    @pl.when(k > 0)
    def _stage():
        Dhat = carry_ref[:, :b, :]
        Uhat = carry_ref[:, b:2 * b, :]
        rhat = carry_ref[:, 2 * b:, :]
        zero_bb = jnp.zeros((b, b, NT), f32)
        top = jnp.concatenate([Dhat, Uhat, zero_bb, rhat], axis=1)
        P = jnp.concatenate([top, Pk], axis=0)         # (2b, 3b+t, NT)
        P = _qr_eliminate_lanes_mosaic(P, b)
        F_ref[0] = P[:b]
        carry_ref[:, :2 * b, :] = P[b:, b:3 * b, :]
        carry_ref[:, 2 * b:, :] = P[b:, 3 * b:, :]

    @pl.when(k == S - 1)
    def _finish():
        Cf_ref[...] = carry_ref[...]


def _band_bwd_kernel(Cf_ref, F_ref, x_ref, x1_ref, x2_ref, *, S, b, t):
    """Back substitution; grid (n_tiles, S), j-th step handles stage
    S-1-j.  F blocks stream in reverse via the BlockSpec index_map."""
    NT = Cf_ref.shape[-1]
    f32 = Cf_ref.dtype
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _last():
        Dhat = Cf_ref[:, :b, :]
        rhat = Cf_ref[:, 2 * b:, :]
        Pf = jnp.concatenate([Dhat, rhat], axis=1)     # (b, b+t, NT)
        Pf = _qr_eliminate_lanes_mosaic(Pf, b)
        x_last = _tri_solve_lanes_mosaic(Pf[:, :b, :], Pf[:, b:, :])
        x_ref[0] = x_last
        x1_ref[...] = x_last
        x2_ref[...] = jnp.zeros((b, t, NT), f32)

    @pl.when(j > 0)
    def _stage():
        Fk = F_ref[0]                                  # (b, 3b+t, NT)
        x1 = x1_ref[...]
        x2 = x2_ref[...]
        rhs_k = (Fk[:, 3 * b:, :]
                 - _bmm_lanes(Fk[:, b:2 * b, :], x1)
                 - _bmm_lanes(Fk[:, 2 * b:3 * b, :], x2))
        x_k = _tri_solve_lanes_mosaic(Fk[:, :b, :], rhs_k)
        x_ref[0] = x_k
        x2_ref[...] = x1
        x1_ref[...] = x_k


def pallas_lanes_fits(S, b, t, lane_tile=128,
                      budget=12 * 1024 * 1024):
    """Whether the lanes sweep's VMEM working set fits.

    The two-kernel design streams the stage factors through HBM, so the
    footprint is per-stage blocks only — independent of S; even DIP-length
    chains (S=101) fit."""
    n_p = 3 * b + t
    per_stage = (2 * 2 * b * n_p         # Pin in + F out, double-buffered
                 + 2 * 2 * b * n_p       # elimination panel + temps
                 + b * (2 * b + t)       # carry
                 + 2 * b * t)            # x1/x2
    return per_stage * lane_tile * 4 <= budget


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def band_solve_qr_pallas_lanes(D, U, Lo, rhs, lane_tile=128,
                               interpret=False):
    """Lanes-layout Pallas band sweep.

    D: (N, S, b, b); U, Lo: (N, S-1, b, b); rhs: (N, S, b, t) ->
    x: (N, S, b, t) float32.  N pads up to ``lane_tile``.
    """
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    f32 = jnp.float32
    n_p = 3 * b + t
    D, rhs = D.astype(f32), rhs.astype(f32)
    U, Lo = U.astype(f32), Lo.astype(f32)

    zN = jnp.zeros((N, 1, b, b), f32)
    L_sh = jnp.concatenate([zN, Lo], axis=1) if S > 1 else zN
    U_sh = jnp.concatenate([U, zN], axis=1) if S > 1 else zN
    Pin = jnp.concatenate([L_sh, D, U_sh, rhs], axis=3)  # (N,S,b,n_p)
    Pin = jnp.moveaxis(Pin, 0, -1)                       # (S,b,n_p,N)

    NT = lane_tile
    pad = (-N) % NT
    if pad:
        # identity padding chains: [L|D|U|r] = [0|I|0|0]
        eye = jnp.broadcast_to(
            jnp.pad(jnp.eye(b, dtype=f32), ((0, 0), (b, b + t))),
            (pad, S, b, n_p))
        Pin = jnp.concatenate([Pin, jnp.moveaxis(eye, 0, -1)], axis=-1)
    Np = N + pad
    SF = max(S - 1, 1)

    F, Cf = pl.pallas_call(
        functools.partial(_band_fwd_kernel, S=S, b=b, t=t),
        out_shape=(jax.ShapeDtypeStruct((SF, b, n_p, Np), f32),
                   jax.ShapeDtypeStruct((b, 2 * b + t, Np), f32)),
        grid=(Np // NT, S),
        in_specs=[pl.BlockSpec((1, b, n_p, NT),
                               lambda i, k: (k, 0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            # k=0 produces no factors; map it onto block 0, which k=1
            # overwrites before the buffer ever flushes (same block index)
            pl.BlockSpec((1, b, n_p, NT),
                         lambda i, k: (jnp.maximum(k - 1, 0), 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2 * b + t, NT),
                         lambda i, k: (0, 0, i),
                         memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((b, 2 * b + t, NT), f32)],
        interpret=interpret,
    )(Pin)

    out = pl.pallas_call(
        functools.partial(_band_bwd_kernel, S=S, b=b, t=t),
        out_shape=jax.ShapeDtypeStruct((S, b, t, Np), f32),
        grid=(Np // NT, S),
        in_specs=[
            pl.BlockSpec((b, 2 * b + t, NT),
                         lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            # stage S-1-j's factors; j=0 needs none (clamp into range)
            pl.BlockSpec((1, b, n_p, NT),
                         lambda i, j: (jnp.clip(S - 1 - j, 0, SF - 1),
                                       0, 0, i),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, b, t, NT),
                               lambda i, j: (S - 1 - j, 0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, t, NT), f32),
                        pltpu.VMEM((b, t, NT), f32)],
        interpret=interpret,
    )(Cf, F)
    return jnp.moveaxis(out, -1, 0)[:N]                  # (N,S,b,t)


def _lane_tile():
    # read at trace time; 128 fills the lane dim exactly, larger tiles
    # amortize per-grid-step overhead at the cost of VMEM (A/B knob)
    import os as _os
    return int(_os.environ.get("DOMPC_TPU_PALLAS_LANES", "128"))


@jax.custom_batching.custom_vmap
def band_solve_pallas(D, U, Lo, rhs):
    """:func:`band_solve_qr_pallas_lanes` with the same outer-vmap
    flattening rule as ``batchqr.band_solve``: the solver batch flattens
    into the chain/lane axis instead of adding a loop dimension."""
    return band_solve_qr_pallas_lanes(D, U, Lo, rhs,
                                      lane_tile=_lane_tile())


@band_solve_pallas.def_vmap
def _band_solve_pallas_vmap(axis_size, in_batched, D, U, Lo, rhs):
    args = []
    for x, bt in zip((D, U, Lo, rhs), in_batched):
        if not bt:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        args.append(x.reshape((-1,) + x.shape[2:]))
    out = band_solve_qr_pallas_lanes(*args, lane_tile=_lane_tile())
    return out.reshape((axis_size, -1) + out.shape[1:]), True


@functools.partial(jax.jit, static_argnames=("chains_per_tile",
                                             "interpret"))
def band_solve_qr_pallas(D, U, Lo, rhs, chains_per_tile=4,
                         interpret=False):
    """Solve N independent block-tridiagonal systems with t RHS columns.

    D: (N, S, b, b); U, Lo: (N, S-1, b, b); rhs: (N, S, b, t).
    Returns x: (N, S, b, t) float32.  N is padded up to the tile size.
    """
    N, S, b, _ = D.shape
    t = rhs.shape[-1]
    f32 = jnp.float32
    D, rhs = D.astype(f32), rhs.astype(f32)
    U, Lo = U.astype(f32), Lo.astype(f32)

    # pack per-stage rows [L_{k-1}, D_k, U_k, r_k] (width 3b+t) so the
    # kernel's VMEM blocks pad lanes to 128 once, not per (b, b) block
    zN = jnp.zeros((N, 1, b, b), f32)
    L_sh = jnp.concatenate([zN, Lo], axis=1) if S > 1 else zN
    U_sh = jnp.concatenate([U, zN], axis=1) if S > 1 else zN
    Pin = jnp.concatenate([L_sh, D, U_sh, rhs], axis=3)   # (N,S,b,3b+t)

    G = min(chains_per_tile, N)
    pad = (-N) % G
    if pad:
        eyepad = jnp.concatenate([
            jnp.zeros((pad, S, b, b), f32),
            jnp.broadcast_to(jnp.eye(b, dtype=f32), (pad, S, b, b)),
            jnp.zeros((pad, S, b, b + t), f32)], axis=3)
        Pin = jnp.concatenate([Pin, eyepad], axis=0)
    Np = N + pad
    n_p = 3 * b + t

    spec_in = pl.BlockSpec((G, S, b, n_p), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((G, S, b, t), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_band_sweep_kernel, S=S, b=b, t=t),
        out_shape=jax.ShapeDtypeStruct((Np, S, b, t), f32),
        grid=(Np // G,),
        in_specs=[spec_in],
        out_specs=spec_out,
        scratch_shapes=[pltpu.VMEM((G, S, b, n_p), f32)],
        interpret=interpret,
    )(Pin)
    return out[:N]
