"""Pallas band-sweep kernel vs the lax.scan reference implementation.

Runs in interpreter mode so the check works on the CPU test platform; the
TPU-compiled path is exercised by bench.py on hardware.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dompc_tpu.solver.bbd import band_solve_qr_multi
from dompc_tpu.solver.batchqr import band_solve_qr_lanes
from dompc_tpu.solver.pallas_band import (band_solve_qr_pallas,
                                          band_solve_qr_pallas_lanes,
                                          pallas_lanes_fits)


def _case(N, S, b, t, seed):
    rng = np.random.default_rng(seed)
    D = jnp.asarray(rng.standard_normal((N, S, b, b)), jnp.float32) \
        + 4 * jnp.eye(b, dtype=jnp.float32)
    U = jnp.asarray(rng.standard_normal((N, max(S - 1, 0), b, b)),
                    jnp.float32)
    Lo = jnp.asarray(rng.standard_normal((N, max(S - 1, 0), b, b)),
                     jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((N, S, b, t)), jnp.float32)
    return D, U, Lo, rhs


def test_pallas_band_matches_scan_qr():
    for (N, S, b, t) in [(3, 5, 4, 2), (2, 1, 3, 1), (5, 13, 7, 3)]:
        D, U, Lo, rhs = _case(N, S, b, t, seed=S)
        ref = jax.vmap(band_solve_qr_multi)(D, U, Lo, rhs)
        got = band_solve_qr_pallas(D, U, Lo, rhs, chains_per_tile=2,
                                   interpret=True)
        rel = float(jnp.max(jnp.abs(ref - got))) \
            / float(jnp.max(jnp.abs(ref)))
        assert rel < 5e-5, f"N={N} S={S} b={b} t={t}: rel {rel:.2e}"


def test_pallas_band_pad_to_tile():
    # N not divisible by the tile: padding chains must not disturb results
    D, U, Lo, rhs = _case(3, 4, 5, 2, seed=9)
    ref = jax.vmap(band_solve_qr_multi)(D, U, Lo, rhs)
    got = band_solve_qr_pallas(D, U, Lo, rhs, chains_per_tile=2,
                               interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-5


def test_pallas_lanes_kernel_matches_xla_lanes():
    """The lanes-layout kernel shares the elimination/substitution math
    with batchqr.band_solve_qr_lanes; results agree to f32 roundoff
    (bit-identity does not survive XLA's shape-dependent reassociation),
    and the operator residual stays at solve accuracy."""
    for (N, S, b, t) in [(3, 5, 4, 2), (2, 1, 3, 1), (5, 13, 7, 3),
                         (3, 21, 13, 12)]:
        D, U, Lo, rhs = _case(N, S, b, t, seed=41 + S)
        ref = band_solve_qr_lanes(D, U, Lo, rhs)
        got = band_solve_qr_pallas_lanes(D, U, Lo, rhs, lane_tile=8,
                                         interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        rel = float(jnp.max(jnp.abs(ref - got))) / scale
        assert rel < 1e-2, (N, S, b, t, rel)
        y = jnp.einsum("nkij,nkjt->nkit", D, got)
        if S > 1:
            y = y.at[:, :-1].add(
                jnp.einsum("nkij,nkjt->nkit", U, got[:, 1:]))
            y = y.at[:, 1:].add(
                jnp.einsum("nkij,nkjt->nkit", Lo, got[:, :-1]))
        resid = float(jnp.max(jnp.abs(y - rhs))) \
            / float(jnp.max(jnp.abs(rhs)))
        assert resid < 1e-3, (N, S, b, t, resid)


def test_pallas_lanes_pad_and_accuracy():
    # N not divisible by the lane tile; accuracy vs the scan-QR reference
    D, U, Lo, rhs = _case(5, 7, 5, 2, seed=23)
    ref = jax.vmap(band_solve_qr_multi)(D, U, Lo, rhs)
    got = band_solve_qr_pallas_lanes(D, U, Lo, rhs, lane_tile=4,
                                     interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-5


def test_pallas_lanes_vmem_gate():
    # streaming design: footprint is per-stage, so even DIP-length
    # chains fit; absurd block sizes must not claim to fit
    assert pallas_lanes_fits(21, 13, 12)
    assert pallas_lanes_fits(101, 13, 12)
    assert not pallas_lanes_fits(21, 400, 400)


@pytest.mark.tpu
@pytest.mark.skipif(
    not os.environ.get("DOMPC_TEST_TPU")
    or jax.default_backend() != "tpu",
    reason="compiled Mosaic lowering needs a real TPU "
           "(DOMPC_TEST_TPU=1 on hardware)")
def test_pallas_lanes_kernel_compiled_on_tpu():
    """The interpret=True tests above validate the math; this one runs
    the actual Mosaic lowering (masked-iota indexing, @pl.when staging,
    BlockSpec index_map streaming) and compares against the XLA lanes
    sweep on-device — the flagship (S=21, b=13) and a SPIKE-class long
    chain."""
    for (N, S, b, t) in [(128, 21, 13, 12), (16, 101, 13, 12)]:
        D, U, Lo, rhs = _case(N, S, b, t, seed=101 + S)
        ref = band_solve_qr_lanes(D, U, Lo, rhs)
        got = band_solve_qr_pallas_lanes(D, U, Lo, rhs)
        scale = float(jnp.max(jnp.abs(ref)))
        rel = float(jnp.max(jnp.abs(ref - got))) / scale
        assert rel < 1e-2, (N, S, b, t, rel)
        y = jnp.einsum("nkij,nkjt->nkit", D, got)
        if S > 1:
            y = y.at[:, :-1].add(
                jnp.einsum("nkij,nkjt->nkit", U, got[:, 1:]))
            y = y.at[:, 1:].add(
                jnp.einsum("nkij,nkjt->nkit", Lo, got[:, :-1]))
        resid = float(jnp.max(jnp.abs(y - rhs))) \
            / float(jnp.max(jnp.abs(rhs)))
        assert resid < 1e-3, (N, S, b, t, resid)


def test_pallas_band_extreme_scales():
    """Barrier diagonals reach ~1e20+ in float32 interior-point KKT
    systems; the Householder reflector must be computed scale-invariantly
    (a naive sum of squares overflows and silently skips elimination)."""
    rng = np.random.default_rng(3)
    N, S, b, t = 2, 6, 5, 2
    D = jnp.asarray(rng.standard_normal((N, S, b, b)), jnp.float32) \
        + 4 * jnp.eye(b, dtype=jnp.float32)
    # one huge barrier-style diagonal entry per stage
    D = D.at[:, :, 0, 0].set(1e22)
    U = jnp.asarray(rng.standard_normal((N, S - 1, b, b)), jnp.float32)
    Lo = jnp.asarray(rng.standard_normal((N, S - 1, b, b)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((N, S, b, t)), jnp.float32)
    got = band_solve_qr_pallas(D, U, Lo, rhs, chains_per_tile=2,
                               interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    # residual check against the operator itself
    y = jnp.einsum("nkij,nkjt->nkit", D, got)
    y = y.at[:, :-1].add(jnp.einsum("nkij,nkjt->nkit", U, got[:, 1:]))
    y = y.at[:, 1:].add(jnp.einsum("nkij,nkjt->nkit", Lo, got[:, :-1]))
    resid = float(jnp.max(jnp.abs(y - rhs))) / float(jnp.max(jnp.abs(rhs)))
    assert resid < 1e-3, f"residual {resid:.2e}"
