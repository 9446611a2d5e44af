"""MHE estimated-parameter bounds + scaling power index.

The reference accepts ``bounds['lower','_p_est',name]`` and
``scaling[...,'_p_est',...]`` (do_mpc/optimizer.py:305,334,404,428; storage
at do_mpc/estimator/_mhe.py:201-202).  These tests pin the same API here:
the bound must actually clip the estimate, and scaling must round-trip.
"""
import numpy as np
import pytest

from dompc_tpu.systems import (
    rotating_masses_model, rotating_masses_simulator)


def _build_mhe(model, p_lb=None, p_ub=None, p_scaling=None):
    """Rotating-masses MHE (systems/_rotating_masses.py:109) with p_est
    box bounds instead of the reference example's nl_cons emulation."""
    import dompc_tpu as dm
    mhe = dm.estimator.MHE(model, ["Theta_1"])
    mhe.settings.n_horizon = 5
    mhe.settings.t_step = 0.1
    mhe.settings.store_full_solution = True
    P_v = model.tvp["P_v"]
    P_x = 1e-4 * np.eye(8)
    P_p = model.p["P_p"]
    mhe.set_default_objective(P_x, P_v, P_p)
    tvp_template = mhe.get_tvp_template()
    for k in range(5):
        tvp_template["_tvp", k, "P_v"] = np.diag(
            np.array([1.0, 1, 1, 20, 20]))
    mhe.set_tvp_fun(lambda t: tvp_template)

    p_template = mhe.get_p_template()

    def p_fun_mhe(t_now):
        p_template["P_p"] = 1.0
        p_template["Theta_2"] = 2.25e-4
        p_template["Theta_3"] = 2.25e-4
        return p_template
    mhe.set_p_fun(p_fun_mhe)

    y_template = mhe.get_y_template()

    def y_fun(t_now):
        n_steps = min(mhe.data._y.shape[0], mhe.settings.n_horizon)
        for k in range(-n_steps, 0):
            y_template["y_meas", k] = mhe.data._y[k]
        return y_template
    mhe.set_y_fun(y_fun)

    mhe.bounds["lower", "_u", "phi_m_set"] = -5
    mhe.bounds["upper", "_u", "phi_m_set"] = 5
    if p_scaling is not None:
        mhe.scaling["_p_est", "Theta_1"] = p_scaling
    if p_lb is not None:
        mhe.bounds["lower", "_p_est", "Theta_1"] = p_lb
    if p_ub is not None:
        mhe.bounds["upper", "_p_est", "Theta_1"] = p_ub
    mhe.setup()
    return mhe


def _run_loop(mhe, n_steps=4, seed=7):
    model = mhe.model
    sim = rotating_masses_simulator(model)
    rng = np.random.default_rng(seed)
    x0_true = rng.random(model.n_x) - 0.5
    sim.x0 = x0_true
    mhe.x0 = np.zeros(model.n_x)
    mhe.p_est0 = 1e-4
    mhe.set_initial_guess()
    u0 = np.array([[0.5], [-0.5]])
    est = []
    for _ in range(n_steps):
        y = sim.make_step(u0)
        mhe.make_step(y)
        est.append(float(mhe._p_est0.data[0]))
    return np.asarray(est)


def test_p_est_bound_accessors_roundtrip():
    model = rotating_masses_model()
    mhe = _build_mhe(model, p_lb=1e-5, p_ub=1e-3)
    assert float(np.asarray(
        mhe.bounds["lower", "_p_est", "Theta_1"]).reshape(())) == 1e-5
    assert float(np.asarray(
        mhe.bounds["upper", "_p_est", "Theta_1"]).reshape(())) == 1e-3
    # layout lb/ub carry the bound on the p_est slot
    sl = mhe.layout.sl(("p_est",))
    assert np.allclose(mhe._lb_opt_x[sl], 1e-5)
    assert np.allclose(mhe._ub_opt_x[sl], 1e-3)


def test_p_est_upper_bound_clips():
    """With an upper bound below the unconstrained estimate, the reported
    parameter must respect (and ride) the bound."""
    model = rotating_masses_model()
    free = _run_loop(_build_mhe(model))
    assert free.size > 0
    # choose a bound strictly inside the unconstrained trajectory's range
    ub = 0.6 * float(free.max())
    bounded = _run_loop(_build_mhe(model, p_lb=1e-6, p_ub=ub))
    assert np.all(bounded <= ub * (1 + 1e-5) + 1e-12), (
        f"estimate exceeds bound: max {bounded.max():.3e} vs ub {ub:.3e}")
    # the bound is active at least once (the free run went above it)
    assert bounded.max() > 0.5 * ub


def test_p_est_scaling_applies():
    """Scaled estimated parameter must produce the same physical estimate
    (scaling only reconditions the NLP; reference optimizer.py:404)."""
    model = rotating_masses_model()
    base = _run_loop(_build_mhe(model, p_lb=1e-6, p_ub=1e-3))
    scaled = _run_loop(_build_mhe(model, p_lb=1e-6, p_ub=1e-3,
                                  p_scaling=1e-4))
    np.testing.assert_allclose(scaled, base, rtol=2e-3, atol=1e-8)
