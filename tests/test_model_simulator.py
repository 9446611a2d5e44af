"""Model + Simulator parity vs the reference's golden CVODES trajectories:
feed the golden u-sequence into our integrator and compare states."""
import numpy as np
import pytest

import dompc_tpu as dm
from golden import load_golden
import systems


def test_collocation_coefficients():
    from dompc_tpu.ops.collocation import collocation_points, lagrange_matrices
    # Radau deg 2: points [1/3, 1]
    np.testing.assert_allclose(collocation_points(2, "radau"),
                               [1 / 3, 1.0], atol=1e-12)
    # Radau deg 3: [(4-sqrt6)/10, (4+sqrt6)/10, 1]
    np.testing.assert_allclose(
        collocation_points(3, "radau"),
        [(4 - np.sqrt(6)) / 10, (4 + np.sqrt(6)) / 10, 1.0], atol=1e-12)
    tau, C, D = lagrange_matrices(2, "radau")
    # D interpolates to endpoint: radau includes 1 -> D = e_last
    np.testing.assert_allclose(D, [0, 0, 1], atol=1e-12)
    # Columns of C sum to zero (derivative of constant is 0)
    np.testing.assert_allclose(C.sum(axis=0), 0, atol=1e-12)


def test_model_jacobians():
    m = systems.cstr_model()
    x = np.array([0.8, 0.5, 134.14, 130.0])
    u = np.array([18.0, -4500.0])
    p = np.array([1.0, 1.0])
    A, B, C, D = m.get_linear_system_matrices(x, u, pss=p)
    assert A.shape == (4, 4) and B.shape == (4, 2)
    # finite-difference check of A
    import jax.numpy as jnp
    f0 = np.asarray(m._rhs_fun(x, u, np.zeros(0), np.zeros(0), p, np.zeros(0)))
    eps = 1e-6
    for i in range(4):
        dx = x.copy(); dx[i] += eps
        fi = np.asarray(m._rhs_fun(dx, u, np.zeros(0), np.zeros(0), p,
                                   np.zeros(0)))
        np.testing.assert_allclose((fi - f0) / eps, A[:, i],
                                   rtol=1e-3, atol=1e-4)


def test_oscillating_masses_simulator_golden():
    ref = load_golden("results_oscillatingMasses")
    m = systems.oscillating_masses_model()
    sim = dm.Simulator(m)
    sim.set_param(t_step=0.5)
    sim.setup()
    sim.x0 = ref["simulator"]._x[0]
    for u in ref["simulator"]._u:
        sim.make_step(u.reshape(-1, 1))
    np.testing.assert_allclose(sim.data._x, ref["simulator"]._x, atol=1e-10)


def test_cstr_simulator_golden():
    ref = load_golden("results_CSTR")
    m = systems.cstr_model()
    sim = systems.cstr_simulator(m)
    sim.x0 = ref["simulator"]._x[0]
    for u in ref["simulator"]._u:
        sim.make_step(u.reshape(-1, 1))
    # state magnitudes ~100 (temperatures); compare to CVODES @1e-10 tightly
    err = np.max(np.abs(sim.data._x - ref["simulator"]._x)
                 / np.maximum(1.0, np.abs(ref["simulator"]._x)))
    assert err < 1e-7, f"relative state error vs CVODES: {err:.3e}"


def test_adaptive_integrator_f32_tolerance_floor():
    """Requesting abstol/reltol below float32 resolution must not degrade
    the trajectory (r4 regression: the step-doubling error estimate
    saturates at rounding noise, steps shrink toward max_steps, and the
    closed loop drifts — caught by scripts/tpu_smoke.py).  The integrator
    clamps tolerances to ~50 eps of the dtype."""
    import jax.numpy as jnp
    from dompc_tpu.ops.integrators import make_adaptive_dae_integrator

    def f(x, z, args):
        # stiff-ish linear test system with known solution
        return jnp.asarray([-50.0 * x[0], x[0] - 0.5 * x[1]])

    def g(x, z, args):
        return jnp.zeros((0,), x.dtype)

    step = make_adaptive_dae_integrator(f, g, n_z=0, abstol=1e-10,
                                        reltol=1e-10)
    x0 = np.array([1.0, 0.0])
    for dtype, tol in ((np.float64, 1e-8), (np.float32, 2e-4)):
        x = jnp.asarray(x0, dtype)
        z = jnp.zeros((0,), dtype)
        xf, _ = step(x, z, None, 0.5)
        exact0 = np.exp(-50.0 * 0.5)
        # x1' = x0 - 0.5 x1 -> analytic via integrating factor
        exact1 = (np.exp(-0.5 * 0.5) - np.exp(-50.0 * 0.5)) / 49.5
        assert np.all(np.isfinite(np.asarray(xf)))
        assert abs(float(xf[0]) - exact0) < tol, (dtype, float(xf[0]))
        assert abs(float(xf[1]) - exact1) < tol, (dtype, float(xf[1]))


def test_rk4_vs_radau_nonstiff():
    m = systems.lotka_volterra_model()
    sim1 = dm.Simulator(m)
    sim1.set_param(t_step=0.1, integration_tool="radau", substeps=4)
    sim1.setup()
    sim2 = dm.Simulator(m)
    sim2.set_param(t_step=0.1, integration_tool="rk4", substeps=50)
    sim2.setup()
    sim1.x0 = np.array([0.5, 0.7])
    sim2.x0 = np.array([0.5, 0.7])
    for _ in range(20):
        sim1.make_step(np.array([[0.3]]))
        sim2.make_step(np.array([[0.3]]))
    np.testing.assert_allclose(sim1.data._x, sim2.data._x, atol=1e-8)


def test_linear_model_and_discretize():
    lm = dm.model.LinearModel("continuous")
    lm.set_variable("_x", "x", (2, 1))
    lm.set_variable("_u", "u", (1, 1))
    A = np.array([[0.0, 1.0], [-2.0, -0.5]])
    B = np.array([[0.0], [1.0]])
    lm.setup(A, B)
    np.testing.assert_allclose(lm.sys_A, A, atol=1e-12)
    dlm = lm.discretize(0.1)
    import scipy.linalg
    Ad = scipy.linalg.expm(A * 0.1)
    np.testing.assert_allclose(dlm.sys_A, Ad, atol=1e-10)


def test_model_pickle_unpickle():
    """Reference pattern: testing/test_CSTR.py:71-81 (test_pickle_unpickle).
    Expressions serialize as op-trees; compiled closures are rebuilt on
    unpickle and must produce identical rhs/Jacobian/measurement values."""
    import pickle

    m = systems.cstr_model()
    m2 = pickle.loads(pickle.dumps(m))
    x = np.array([0.8, 0.5, 134.14, 130.0])
    u = np.array([10.0, -4500.0])
    z = np.zeros(m.n_z)
    tvp = np.zeros(m.n_tvp)
    p = np.array([1.0, 1.0])
    w = np.zeros(m.n_w)
    v = np.zeros(m.n_v)
    np.testing.assert_array_equal(
        np.asarray(m._rhs_fun(x, u, z, tvp, p, w)),
        np.asarray(m2._rhs_fun(x, u, z, tvp, p, w)))
    np.testing.assert_array_equal(
        np.asarray(m._meas_fun(x, u, z, tvp, p, v)),
        np.asarray(m2._meas_fun(x, u, z, tvp, p, v)))
    for M1, M2 in zip(m.get_linear_system_matrices(x, u),
                      m2.get_linear_system_matrices(x, u)):
        np.testing.assert_array_equal(M1, M2)
    # an unpickled model drives a Simulator like the original
    sim = dm.Simulator(m2)
    sim.set_param(t_step=0.005)
    ptmpl = sim.get_p_template()
    ptmpl["alpha"] = 1.0
    ptmpl["beta"] = 1.0
    sim.set_p_fun(lambda t: ptmpl)
    sim.setup()
    sim.x0 = x
    y = sim.make_step(u.reshape(-1, 1))
    assert np.all(np.isfinite(y))


def test_sym_closure_refuses_pickle():
    import pickle
    import pytest
    from dompc_tpu import sym as casym

    raw = casym.Sym(lambda env: env["_x"]["a"])
    with pytest.raises(TypeError, match="raw closure"):
        pickle.dumps(raw)
