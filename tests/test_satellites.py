"""Sampling tools, NLP differentiator, approximate MPC, graphics."""
import os

import numpy as np
import pytest

import dompc_tpu as dm
from golden import load_golden
import systems


def test_sampling_tools_golden(tmp_path):
    """Mirrors the reference sampling_test example
    (examples/tools/sampling/regular/test_fun/sampling_test.py) and checks
    against the golden pickle."""
    np.random.seed(123)
    sp = dm.sampling.SamplingPlanner()
    sp.set_param(overwrite=True)
    sp.data_dir = str(tmp_path) + "/"
    sp.set_sampling_var("alpha", lambda: np.random.randn())
    sp.set_sampling_var("beta", lambda: np.random.randint(0, 5))
    sp.gen_sampling_plan(n_samples=10)
    sp.add_sampling_case(alpha=10)
    sp.add_sampling_case(beta=10)
    plan = sp.add_sampling_case(alpha=2, beta=2)

    sampler = dm.sampling.Sampler(plan)
    sampler.set_param(overwrite=True, print_progress=False)
    sampler.data_dir = str(tmp_path) + "/"
    sampler.set_sample_function(lambda alpha, beta: alpha * beta)
    sampler.sample_data()

    dh = dm.sampling.DataHandler(plan)
    dh.data_dir = str(tmp_path) + "/"
    dh.set_post_processing("res_1", lambda x: x)
    dh.set_post_processing("res_2", lambda x: x ** 2)
    res = dh[:]
    res1 = dh.filter(input_filter=lambda alpha: alpha < 0)
    res2 = dh.filter(output_filter=lambda res_1: res_1 < 0)

    import pickle
    with open("/root/reference/testing/results/"
              "res_sampling_test_test_fun.pkl", "rb") as f:
        ref = pickle.load(f)
    assert res == ref["res"]
    assert res1 == ref["res1"]
    assert res2 == ref["res2"]


def test_differentiator_finite_difference():
    """du*/dx0 from the IFT differentiator vs finite differences."""
    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)
    np.random.seed(99)
    x0 = np.random.rand(4) - 0.5
    mpc.x0 = x0
    mpc.set_initial_guess()
    mpc.make_step(x0)

    diff = dm.differentiator.DoMPCDifferentiator(mpc)
    dx_dp, _ = diff.differentiate()
    u_sl = mpc.layout.sl(("u", 0, 0))
    x0_sl = mpc._p_sl["x0"]
    du_dx0 = dx_dp[u_sl, x0_sl]

    # finite differences over fresh solves
    eps = 1e-5
    du_fd = np.zeros((model.n_u, model.n_x))
    for i in range(model.n_x):
        us = []
        for sgn in (+1, -1):
            m2 = systems.oscillating_masses_mpc(
                systems.oscillating_masses_model())
            x0p = x0.copy()
            x0p[i] += sgn * eps
            m2.x0 = x0p
            m2.set_initial_guess()
            us.append(m2.make_step(x0p).reshape(-1))
        du_fd[:, i] = (us[0] - us[1]) / (2 * eps)
    # u0 is at its bound (0.5) for this x0? pick tolerance accordingly
    np.testing.assert_allclose(du_dx0, du_fd, atol=5e-4)


def test_approx_mpc_pipeline(tmp_path):
    """Box sampling -> batched solves -> training -> policy evaluation
    (reference: examples/CSTR_approximate_mpc flow)."""
    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)

    sampler_settings = dm.approximateMPC.AMPCSamplerSettings(
        n_samples=64, data_dir=str(tmp_path))
    sampler = dm.approximateMPC.AMPCSampler(mpc, sampler_settings)
    # box corners of this hard-constrained problem are infeasible (tiny
    # input authority); sample a 30% sub-box like a practical user would
    x_lb, x_ub = mpc._x_lb.data, mpc._x_ub.data
    plan = sampler.default_sampling_plan(
        seed=0, lbx=0.3 * x_lb, ubx=0.3 * x_ub)
    X, U_prev, U, OK = sampler.sample_open_loop_batched(
        plan, batch_size=32, tol=1e-6, max_iter=80)
    assert OK.mean() > 0.9
    full, opt = sampler.save_dataset(X, U_prev, U, OK)

    approx = dm.approximateMPC.ApproxMPC(mpc)
    trainer_settings = dm.approximateMPC.TrainerSettings(
        n_epochs=300, batch_size=32, learning_rate=3e-3,
        print_frequency=0)
    trainer = dm.approximateMPC.Trainer(approx, trainer_settings)
    hist = trainer.default_training(opt["x0"], opt["u_opt"],
                                    U_prev=opt["u_prev"], seed=0)
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    # policy should approximate the MPC on a training point
    i = int(np.nonzero(OK)[0][0])
    u_pi = approx.make_step(X[i], u_prev=U_prev[i])
    assert np.max(np.abs(u_pi.reshape(-1) - U[i])) < 0.2
    # save / load round trip
    path = os.path.join(str(tmp_path), "policy.pkl")
    approx.save_to_state_dict(path)
    approx.load_from_state_dict(path)


def test_differentiator_active_inequality():
    """Sensitivities at an ACTIVE nl_cons (the case the active-set logic
    exists for, reference differentiator :347-394): with the first input
    pinned by an active inequality u <= 0.3, du0/dx0 must be ~0 — and the
    IFT only produces that when the active constraint row is included."""
    def build():
        model = systems.oscillating_masses_model()
        mpc = dm.controller.MPC(model)
        mpc.settings.n_horizon = 7
        mpc.settings.t_step = 0.5
        mpc.set_objective(mterm=model.aux["cost"], lterm=model.aux["cost"])
        mpc.set_rterm(u=1e-4)
        max_x = np.array([[4.0], [10.0], [4.0], [10.0]])
        mpc.bounds["lower", "_x", "x"] = -max_x
        mpc.bounds["upper", "_x", "x"] = max_x
        mpc.bounds["lower", "_u", "u"] = -0.5
        mpc.bounds["upper", "_u", "u"] = 0.5
        mpc.set_nl_cons("ulim", model.u["u"], ub=0.3)
        mpc.setup()
        return mpc

    mpc = build()
    np.random.seed(99)
    x0 = np.random.rand(4) - 0.5     # the seed where u0 wants > 0.3
    mpc.x0 = x0
    mpc.set_initial_guess()
    u0 = mpc.make_step(x0)
    assert abs(float(u0) - 0.3) < 1e-5, "nl_cons not active at this x0"
    lam_h = mpc.lam_g_num[mpc.n_opt_lagr:]
    assert np.max(lam_h) > 1e-4, "active constraint has ~zero multiplier"

    diff = dm.differentiator.DoMPCDifferentiator(mpc)
    diff.settings.check_LICQ = True
    diff.settings.check_SC = True
    dx_dp, _ = diff.differentiate()
    du_dx0 = dx_dp[mpc.layout.sl(("u", 0, 0)), mpc._p_sl["x0"]]
    assert diff.status.LICQ

    # finite differences over fresh solves: u stays pinned at 0.3
    eps = 1e-5
    for i in range(2):
        us = []
        for sgn in (+1, -1):
            m2 = build()
            x0p = x0.copy()
            x0p[i] += sgn * eps
            m2.x0 = x0p
            m2.set_initial_guess()
            us.append(float(m2.make_step(x0p)))
        fd = (us[0] - us[1]) / (2 * eps)
        assert abs(du_dx0[0, i] - fd) < 1e-4, (du_dx0[0, i], fd)
    np.testing.assert_allclose(np.asarray(du_dx0), 0.0, atol=1e-6)


def test_graphics_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model = systems.oscillating_masses_model()
    mpc = systems.oscillating_masses_mpc(model)
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    np.random.seed(99)
    x0 = np.random.rand(4) - 0.5
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    for _ in range(3):
        u0 = mpc.make_step(x0)
        x0 = sim.make_step(u0).reshape(-1)

    fig, ax = plt.subplots(2)
    g = dm.graphics.Graphics(mpc.data)
    g.add_line("_x", "x", ax[0])
    g.add_line("_u", "u", ax[1])
    g.plot_results()
    g.plot_predictions(t_ind=-1)
    g.reset_axes()

    # reference-style power indexing over the populated line structures
    # (do_mpc/graphics.py:40-240): prefix queries flatten, finest keys
    # select element/scenario, and handles can be restyled
    x_lines = g.result_lines["_x", "x"]
    assert len(x_lines) == 4                       # one per state element
    assert g.result_lines["_x", "x", 0] == [x_lines[0]]
    assert len(g.result_lines["_x"]) == 4
    assert len(g.result_lines.full) == 5           # + the input line
    preds_x0 = g.pred_lines["_x", "x", 0]
    assert len(preds_x0) >= 1                      # all scenarios of el 0
    assert set(preds_x0) <= set(g.pred_lines["_x", "x"])
    for h in g.pred_lines["_x"]:
        h.set_alpha(0.5)                           # restyling works
    assert ("_x", "x") in g.result_lines

    fig2, axes2, g2 = dm.graphics.default_plot(sim.data)
    plt.close("all")
