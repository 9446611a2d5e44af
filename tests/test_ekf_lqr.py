"""EKF (triple tank) and LQR (oscillating masses) golden regressions
(reference tests: testing/test_triple_tank_EKF.py,
testing/test_oscillating_masses_discrete_lqr.py)."""
import numpy as np

import dompc_tpu as dm
from dompc_tpu.systems import triple_tank_model
from golden import load_golden


def _tank_tvp_fun(tmpl):
    def tvp_fun(t_now):
        tmpl["tvp1"] = 0.5 if t_now < 50 else 1.0
        return tmpl
    return tvp_fun


def test_triple_tank_ekf():
    ref = load_golden("results_triple_tank_ekf")
    model = triple_tank_model()

    sim = dm.Simulator(model)
    sim.set_param(t_step=1)
    p_t = sim.get_p_template()
    p_t["p1"] = 2

    def p_fun(t):
        return p_t
    sim.set_p_fun(p_fun)
    sim.set_tvp_fun(_tank_tvp_fun(sim.get_tvp_template()))
    sim.setup()

    ekf = dm.estimator.EKF(model)
    ekf.settings.t_step = 1
    p_te = ekf.get_p_template()
    p_te["p1"] = 2
    ekf.set_p_fun(lambda t: p_te)
    ekf.set_tvp_fun(_tank_tvp_fun(ekf.get_tvp_template()))
    ekf.setup()

    Q = np.diag(1e-3 * np.ones(model.n_x))
    R = np.diag(1e-2 * np.ones(model.n_y))
    sim.x0 = np.array([2, 2.8, 2.7])
    ekf.x0 = np.array([1.2, 1.4, 1.8])
    sim.set_initial_guess()
    ekf.set_initial_guess()
    np.random.seed(42)
    for _ in range(200):
        u0 = np.array([[0.0001], [0.0001]])
        y_next = sim.make_step(u0, v0=0.001 * np.random.randn(model.n_v, 1))
        ekf.make_step(y_next=y_next, u_next=u0, Q_k=Q, R_k=R)

    for module, mine in (("simulator", sim.data), ("estimator", ekf.data)):
        for attr in ("_x", "_u", "_time"):
            err = np.max(np.abs(getattr(mine, attr)
                                - getattr(ref[module], attr)))
            assert err < 1e-7, f"{module}{attr}: {err:.2e}"


def _run_ekf_steps(abstol, reltol, adaptive=True, substeps=4, n_steps=15):
    model = triple_tank_model()
    ekf = dm.estimator.EKF(model)
    ekf.settings.t_step = 1
    ekf.settings.adaptive = adaptive
    ekf.settings.abstol = abstol
    ekf.settings.reltol = reltol
    ekf.settings.substeps = substeps
    p_te = ekf.get_p_template()
    p_te["p1"] = 2
    ekf.set_p_fun(lambda t: p_te)
    ekf.set_tvp_fun(_tank_tvp_fun(ekf.get_tvp_template()))
    ekf.setup()
    Q = np.diag(1e-3 * np.ones(model.n_x))
    R = np.diag(1e-2 * np.ones(model.n_y))
    ekf.x0 = np.array([1.2, 1.4, 1.8])
    ekf.set_initial_guess()
    rng = np.random.default_rng(7)
    u0 = np.array([[0.0001], [0.0001]])
    for _ in range(n_steps):
        y = 2.0 + 0.01 * rng.standard_normal(model.n_y)
        ekf.make_step(y_next=y, u_next=u0, Q_k=Q, R_k=R)
    return np.asarray(ekf.data._x)


def test_ekf_adaptive_tolerance_sweep():
    """EKF covariance propagation honors abstol/reltol (reference runs
    IDAS at 1e-10, do_mpc/estimator/_ekf.py:162-180): tightening the
    tolerance must converge the trajectory toward a tight reference,
    monotonically within noise."""
    x_ref = _run_ekf_steps(1e-12, 1e-12)
    errs = []
    for tol in (1e-2, 1e-6, 1e-10):
        x = _run_ekf_steps(tol, tol)
        errs.append(np.max(np.abs(x - x_ref)))
    assert errs[1] <= errs[0] + 1e-14
    assert errs[2] <= 1e-9, f"tight-tol error {errs[2]:.2e}"
    assert errs[0] < 1e-2  # loose but sane
    # legacy fixed-substep mode still works and stays close
    x_fixed = _run_ekf_steps(1e-10, 1e-10, adaptive=False, substeps=8)
    assert np.max(np.abs(x_fixed - x_ref)) < 1e-5


def test_oscillating_masses_lqr():
    ref = load_golden("results_oscillatingMasses_LQR")
    lm = dm.model.LinearModel("discrete")
    lm.set_variable("_x", "x", (4, 1))
    lm.set_variable("_u", "u", (1, 1))
    A = np.array([[0.763, 0.460, 0.115, 0.020],
                  [-0.899, 0.763, 0.420, 0.115],
                  [0.115, 0.020, 0.763, 0.460],
                  [0.420, 0.115, -0.899, 0.763]])
    B = np.array([[0.014], [0.063], [0.221], [0.367]])
    lm.setup(A, B)

    lqr = dm.controller.LQR(lm)
    lqr.settings.t_step = 0.5
    lqr.settings.n_horizon = None
    lqr.set_objective(Q=np.identity(4), R=np.identity(1))
    lqr.set_rterm(delR=np.identity(1))
    lqr.setup()

    sim = dm.Simulator(lm)
    sim.set_param(t_step=0.5)
    sim.setup()

    x0 = np.array([[2], [1], [3], [1]])
    sim.x0 = x0
    for _ in range(50):
        u0 = lqr.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = y_next
    for attr in ("_x", "_u", "_time"):
        err = np.max(np.abs(getattr(sim.data, attr)
                            - getattr(ref["simulator"], attr)))
        assert err < 1e-7, f"sim{attr}: {err:.2e}"
