"""MHE bordered-band KKT backend vs the dense KKT backend.

The reference hands the MHE NLP's sparsity to IPOPT/MUMDS wholesale
(estimator/_mhe.py:1251); our structured path factors the stage-banded
KKT with the estimated parameters in the BBD root border.  Both backends
must land on the same optimum — this runs the rotating-masses MHE under
each and compares trajectories tightly (same algorithm, same iterates up
to linear-solver roundoff).
"""
import numpy as np

import dompc_tpu as dm
from dompc_tpu import sym


def small_masses_model():
    """Trimmed rotating-masses model (no tvp matrix weight)."""
    m = dm.model.Model("continuous")
    phi_1 = m.set_variable("_x", "phi_1")
    phi_2 = m.set_variable("_x", "phi_2")
    phi_3 = m.set_variable("_x", "phi_3")
    phi = sym.vertcat(phi_1, phi_2, phi_3)
    dphi = m.set_variable("_x", "dphi", shape=(3, 1))
    phi_m_set = m.set_variable("_u", "phi_m_set", shape=(2, 1))
    phi_m = m.set_variable("_x", "phi_m", shape=(2, 1))
    m.set_meas("phi_meas", phi)
    m.set_meas("phi_m_set_meas", phi_m_set)
    Theta_1 = m.set_variable("_p", "Theta_1")
    c = np.array([2.697, 2.66, 3.05, 2.86]) * 1e-3
    d = np.array([6.78, 8.01, 8.82]) * 1e-5
    Th = 2.25e-4
    m.set_rhs("phi_1", dphi[0])
    m.set_rhs("phi_2", dphi[1])
    m.set_rhs("phi_3", dphi[2])
    dphi_next = sym.vertcat(
        -c[0] / Theta_1 * (phi[0] - phi_m[0])
        - c[1] / Theta_1 * (phi[0] - phi[1]) - d[0] / Theta_1 * dphi[0],
        -c[1] / Th * (phi[1] - phi[0])
        - c[2] / Th * (phi[1] - phi[2]) - d[1] / Th * dphi[1],
        -c[2] / Th * (phi[2] - phi[1])
        - c[3] / Th * (phi[2] - phi_m[1]) - d[2] / Th * dphi[2],
    )
    m.set_rhs("dphi", dphi_next)
    m.set_rhs("phi_m", 1e2 * (phi_m_set - phi_m))
    m.setup()
    return m


def build_mhe(model, kkt_solver):
    mhe = dm.estimator.MHE(model, ["Theta_1"])
    mhe.settings.n_horizon = 6
    mhe.settings.t_step = 0.1
    mhe.settings.kkt_solver = kkt_solver
    P_x = 1e-4 * np.eye(model.n_x)
    P_v = np.diag(np.array([1.0, 1, 1, 20, 20]))
    P_p = np.array([[1.0]])
    mhe.set_default_objective(P_x, P_v, P_p)
    mhe.bounds["lower", "_u", "phi_m_set"] = -5
    mhe.bounds["upper", "_u", "phi_m_set"] = 5
    mhe.bounds["lower", "_x", "dphi"] = -6
    mhe.bounds["upper", "_x", "dphi"] = 6
    mhe.set_nl_cons("p_est_lb", -mhe._p_est["Theta_1"] + 1e-5, 0)
    mhe.set_nl_cons("p_est_ub", mhe._p_est["Theta_1"] - 1e-3, 0)
    mhe.setup()
    return mhe


def run_loop(mhe, ys):
    mhe.x0 = np.zeros(mhe.model.n_x)
    mhe.p_est0 = 1e-4
    mhe.set_initial_guess()
    xs = [mhe.make_step(y) for y in ys]
    return np.concatenate([x.ravel() for x in xs])


def test_mhe_tridiag_matches_dense():
    model = small_masses_model()
    rng = np.random.default_rng(7)
    ys = 0.1 * rng.standard_normal((3, model.n_y, 1))

    mhe_d = build_mhe(model, "dense")
    assert not hasattr(mhe_d, "_kkt_structure")
    x_dense = run_loop(mhe_d, ys)

    mhe_t = build_mhe(model, "tridiag")
    assert hasattr(mhe_t, "_kkt_structure")
    # p_est must sit in the root border (couples every stage)
    asm = mhe_t._kkt_structure
    assert asm.R > 0
    x_band = run_loop(mhe_t, ys)

    err = np.max(np.abs(x_dense - x_band))
    assert err < 1e-6, f"dense vs bordered-band estimate diff {err:.2e}"
    assert np.all(np.isfinite(x_band))
