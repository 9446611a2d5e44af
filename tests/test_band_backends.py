"""Band-sweep backend equivalence (f64): the blocked-WY stage step and
the SPIKE partitioned solve must reproduce the column-at-a-time lanes
sweep exactly (same scaled-Householder QR math, different scheduling).

Measured roles (BENCH.md r3): columns = default (fastest on the
bandwidth-bound flagship, S=21); SPIKE = default for depth-bound long
chains (S >= 48; DIP S=101 measured 3.0x); WY = kept as an A/B option.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dompc_tpu.solver.batchqr import (
    band_solve_qr_lanes, band_solve_qr_lanes_wy, band_solve_spike)


def _rand_band(rng, N, S, b, t):
    D = rng.standard_normal((N, S, b, b)) + 4 * np.eye(b)
    U = rng.standard_normal((N, max(S - 1, 0), b, b)) * 0.5
    Lo = rng.standard_normal((N, max(S - 1, 0), b, b)) * 0.5
    rhs = rng.standard_normal((N, S, b, t))
    return tuple(map(jnp.asarray, (D, U, Lo, rhs)))


@pytest.mark.parametrize("shape", [(4, 21, 13, 12), (3, 7, 5, 2),
                                   (2, 2, 3, 1), (1, 101, 6, 4)])
def test_wy_matches_columns(shape):
    args = _rand_band(np.random.default_rng(0), *shape)
    x_ref = band_solve_qr_lanes(*args)
    x_wy = band_solve_qr_lanes_wy(*args)
    scale = float(jnp.max(jnp.abs(x_ref))) + 1.0
    assert float(jnp.max(jnp.abs(x_wy - x_ref))) / scale < 1e-10


@pytest.mark.parametrize("shape,P", [((4, 21, 13, 12), 2),
                                     ((4, 21, 13, 12), 3),
                                     ((2, 16, 4, 1), 4),
                                     ((1, 101, 6, 4), 13)])
def test_spike_matches_columns(shape, P):
    args = _rand_band(np.random.default_rng(1), *shape)
    x_ref = band_solve_qr_lanes(*args)
    x_sp = band_solve_spike(*args, n_parts=P)
    scale = float(jnp.max(jnp.abs(x_ref))) + 1.0
    assert float(jnp.max(jnp.abs(x_sp - x_ref))) / scale < 1e-10


def test_spike_under_vmap_flattens():
    """The custom-vmap rule must flatten the outer batch into lanes and
    keep results identical to per-element solves."""
    B = 3
    rng = np.random.default_rng(2)
    args = _rand_band(rng, B * 2, 9, 4, 2)
    D, U, Lo, rhs = (a.reshape((B, 2) + a.shape[1:]) for a in args)
    x_v = jax.vmap(lambda d, u, l, r: band_solve_spike(
        d, u, l, r, n_parts=2))(D, U, Lo, rhs)
    for i in range(B):
        x_i = band_solve_spike(D[i], U[i], Lo[i], rhs[i], n_parts=2)
        np.testing.assert_allclose(np.asarray(x_v[i]), np.asarray(x_i),
                                   rtol=1e-12, atol=1e-12)
