"""Unit tests for the interior-point NLP solver against known optima."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dompc_tpu.solver.ipm import make_ipm_solver, IPMSettings


def test_bound_constrained_qp():
    # min (w-3)^2, w in [0, 2] -> w*=2
    f = lambda w, p: jnp.sum((w - 3.0) ** 2)
    g = lambda w, p: jnp.zeros((0,))
    h = lambda w, p: jnp.zeros((0,))
    solve = make_ipm_solver(f, g, h, np.array([0.0]), np.array([2.0]), 0, 0)
    sol = solve(jnp.array([1.0]), jnp.zeros((0,)))
    assert sol.success
    np.testing.assert_allclose(np.asarray(sol.w), [2.0], atol=1e-7)


def test_equality_constrained():
    # min x^2 + y^2 st x + y = 1 -> (0.5, 0.5)
    f = lambda w, p: jnp.sum(w ** 2)
    g = lambda w, p: jnp.array([w[0] + w[1] - 1.0])
    h = lambda w, p: jnp.zeros((0,))
    solve = make_ipm_solver(f, g, h, np.full(2, -np.inf), np.full(2, np.inf),
                            1, 0)
    sol = solve(jnp.array([0.0, 0.0]), jnp.zeros((0,)))
    assert sol.success
    np.testing.assert_allclose(np.asarray(sol.w), [0.5, 0.5], atol=1e-8)


def test_inequality():
    # min (x+1)^2 st x >= 0 via h(x) = -x <= 0 -> x*=0
    f = lambda w, p: jnp.sum((w + 1.0) ** 2)
    g = lambda w, p: jnp.zeros((0,))
    h = lambda w, p: -w
    solve = make_ipm_solver(f, g, h, np.full(1, -np.inf), np.full(1, np.inf),
                            0, 1)
    sol = solve(jnp.array([1.0]), jnp.zeros((0,)))
    assert sol.success
    np.testing.assert_allclose(np.asarray(sol.w), [0.0], atol=1e-7)


def test_hs071():
    # the classic IPOPT example: min x0*x3*(x0+x1+x2) + x2
    # s.t. x0*x1*x2*x3 >= 25 ; sum xi^2 = 40 ; 1 <= x <= 5
    # solution: (1.0, 4.743, 3.821, 1.379)
    def f(w, p):
        return w[0] * w[3] * (w[0] + w[1] + w[2]) + w[2]

    def g(w, p):
        return jnp.array([jnp.sum(w ** 2) - 40.0])

    def h(w, p):
        return jnp.array([25.0 - w[0] * w[1] * w[2] * w[3]])

    solve = make_ipm_solver(f, g, h, np.full(4, 1.0), np.full(4, 5.0), 1, 1)
    sol = solve(jnp.array([1.0, 5.0, 5.0, 1.0]), jnp.zeros((0,)))
    assert sol.success, f"kkt_err={sol.kkt_err}, it={sol.iterations}"
    np.testing.assert_allclose(
        np.asarray(sol.w), [1.0, 4.74299963, 3.82114998, 1.37940829],
        atol=1e-6)


def test_param_and_vmap():
    # min (w - p)^2 st w <= 1  -> w* = min(p, 1); batch over p
    f = lambda w, p: jnp.sum((w - p) ** 2)
    g = lambda w, p: jnp.zeros((0,))
    h = lambda w, p: jnp.zeros((0,))
    solve = make_ipm_solver(f, g, h, np.array([-np.inf]), np.array([1.0]),
                            0, 0)
    ps = jnp.linspace(-2.0, 3.0, 16).reshape(-1, 1)
    w0 = jnp.zeros((16, 1))
    sols = jax.vmap(solve)(w0, ps)
    assert bool(jnp.all(sols.success))
    # note: p == 1.0 is degenerate (optimum exactly at the bound with zero
    # multiplier); 1e-8 KKT tolerance only gives ~1e-4 primal accuracy there,
    # same as IPOPT.
    np.testing.assert_allclose(np.asarray(sols.w).ravel(),
                               np.minimum(np.asarray(ps).ravel(), 1.0),
                               atol=1e-4)


def test_rosenbrock_equality():
    # min 100(y-x^2)^2 + (1-x)^2 s.t. x^2 + y^2 = 2 -> (1, 1)
    def f(w, p):
        return 100.0 * (w[1] - w[0] ** 2) ** 2 + (1 - w[0]) ** 2

    def g(w, p):
        return jnp.array([w[0] ** 2 + w[1] ** 2 - 2.0])

    h = lambda w, p: jnp.zeros((0,))
    solve = make_ipm_solver(f, g, h, np.full(2, -np.inf), np.full(2, np.inf),
                            1, 0)
    sol = solve(jnp.array([0.5, 0.5]), jnp.zeros((0,)))
    assert sol.success
    np.testing.assert_allclose(np.asarray(sol.w), [1.0, 1.0], atol=1e-7)
