"""Closed-loop golden-trajectory regression vs reference IPOPT runs
(reference tests: testing/test_batch_reactor.py, testing/test_CSTR.py).

The CSTR robust problem has a near-degenerate (flat) direction in Q_dot:
any point in a KKT-tolerance band is a certified optimum (IPOPT's own answer
moves by tens of units under solver-option changes), so Q_dot is compared in
scaled units with a loose band while the strongly-determined quantities (F,
states) are tight."""
import numpy as np
import pytest

import dompc_tpu as dm
from golden import load_golden
import systems


def test_batch_reactor_closed_loop():
    ref = load_golden("results_batch_reactor")
    model = systems.batch_reactor_model()
    mpc = systems.batch_reactor_mpc(model)
    sim = dm.Simulator(model)
    sim.set_param(t_step=1.0, substeps=4)
    p_num = sim.get_p_template()
    p_num["Y_x"] = 0.5
    p_num["S_in"] = 200.0
    sim.set_p_fun(lambda t: p_num)
    sim.setup()
    est = dm.estimator.StateFeedback(model)

    x0 = np.array([1.0, 0.5, 0.0, 120.0])
    mpc.x0 = x0
    sim.x0 = x0
    est.x0 = x0
    mpc.set_initial_guess()
    for _ in range(5):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = est.make_step(y)

    err_x = np.abs(mpc.data._x - ref["mpc"]._x).max()
    err_u = np.abs(mpc.data._u - ref["mpc"]._u).max()
    err_sim = np.abs(sim.data._x - ref["simulator"]._x).max()
    assert err_x < 1e-4, f"x err {err_x:.2e}"
    assert err_u < 1e-4, f"u err {err_u:.2e}"
    assert err_sim < 1e-4, f"sim err {err_sim:.2e}"


@pytest.mark.slow
def test_cstr_robust_closed_loop():
    ref = load_golden("results_CSTR")
    model = systems.cstr_model()
    mpc = systems.cstr_mpc(model)
    sim = systems.cstr_simulator(model)
    est = dm.estimator.StateFeedback(model)

    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    sim.x0 = x0
    est.x0 = x0
    mpc.set_initial_guess()
    n_steps = 5   # full reference length (testing/test_CSTR.py:113-145)
    for _ in range(n_steps):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = est.make_step(y)

    # states: relative per-channel (T_R/T_K are O(130), concentrations
    # O(1)); the Q_dot flat band feeds back into T_K over the loop
    x_scale = np.maximum(np.abs(ref["mpc"]._x[:n_steps]), 1.0)
    err_x = (np.abs(mpc.data._x - ref["mpc"]._x[:n_steps])
             / x_scale).max()
    assert err_x < 1e-3, f"x rel err {err_x:.2e}"
    u_scaling = np.array([100.0, 2000.0])
    err_u = (np.abs(mpc.data._u - ref["mpc"]._u[:n_steps]) / u_scaling)
    # F (column 0) is strongly determined; Q_dot sits in the documented
    # near-degenerate band (reduced-Hessian eig ~1e-6: any point in the
    # KKT-tolerance band is a certified optimum) and the closed loop
    # accumulates that band: measured scaled drift over the 5 steps is
    # [0.010, 0.013, 0.015, 0.021, 0.027] — band 4e-2 keeps it a real
    # regression gate without failing on the degeneracy itself.
    assert err_u[:, 0].max() < 1e-3, f"F err {err_u[:, 0].max():.2e}"
    assert err_u[:, 1].max() < 4e-2, f"Q_dot err {err_u[:, 1].max():.2e}"

    # aux over the horizon: same (N, n_scen, n_aux) layout as the
    # reference's _opt_aux_num (do_mpc/optimizer.py:459; CSTR row = 360),
    # except the reference always prepends a constant 'default' aux entry
    # (do_mpc/model/_model.py:116) which we drop.  T_dif involves
    # T_R/T_K ~ O(100) and inherits the Q_dot-band looseness; compare
    # relative.
    aux_mine = mpc.data._opt_aux_num.reshape(n_steps, 20, 9, 1)
    aux_ref = ref["mpc"]._opt_aux_num[:n_steps].reshape(
        n_steps, 20, 9, 2)[..., 1:]
    rel = np.abs(aux_mine - aux_ref) / (1.0 + np.abs(aux_ref))
    # early horizon is strongly determined; the tail inherits the Q_dot
    # flat band (T_K is directly driven by Q_dot), and over the 5-step
    # loop the head positions accumulate the same closed-loop Q_dot
    # drift as the input itself (measured 2.4e-2 at step 5) — same 4e-2
    # band as Q_dot
    assert rel[:, :3].max() < 4e-2, f"aux err(head) {rel[:, :3].max():.2e}"
    assert rel.max() < 0.2, f"aux err(tail) {rel.max():.2e}"
