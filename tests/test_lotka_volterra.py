"""Lotka-Volterra with an integer input (reference: testing/
test_lotka_volterra.py, 2 closed-loop steps).  The reference solves the
MINLP with BONMIN; here branch-and-bound (solver/minlp.py) — whose root
relaxation is already integral for this problem (the optimal input is 0),
so it terminates at the root, matching the golden data exactly."""
import numpy as np

import dompc_tpu as dm
from golden import load_golden
import systems


def lotka_mpc(model):
    mpc = dm.controller.MPC(model)
    s = mpc.settings
    s.n_horizon = 25
    s.n_robust = 0
    s.t_step = 0.3
    s.collocation_deg = 2
    s.collocation_ni = 2
    x_0 = model.x["x_0"]
    x_1 = model.x["x_1"]
    mterm = (x_0 - 1) ** 2 + (x_1 - 1) ** 2
    mpc.set_objective(mterm=mterm, lterm=mterm)
    mpc.set_rterm(inp=1)
    mpc.bounds["lower", "_x", "x_0"] = 0.0
    mpc.bounds["lower", "_x", "x_1"] = 0.0
    mpc.bounds["upper", "_x", "x_0"] = 2.0
    mpc.bounds["lower", "_u", "inp"] = 0.0
    mpc.bounds["upper", "_u", "inp"] = 1.0
    mpc.setup()
    return mpc


def lotka_model_integer():
    m = dm.model.Model("continuous")
    c0, c1 = 0.4, 0.2
    x_0 = m.set_variable("_x", "x_0")
    x_1 = m.set_variable("_x", "x_1")
    inp = m.set_variable("_u", "inp", input_type_integer=True)
    m.set_rhs("x_0", x_0 - x_0 * x_1 - c0 * x_0 * inp)
    m.set_rhs("x_1", -x_1 + x_0 * x_1 - c1 * x_1 * inp)
    m.setup()
    return m


def test_lotka_volterra_closed_loop():
    ref = load_golden("results_lotka_volterra")
    model = lotka_model_integer()
    mpc = lotka_mpc(model)
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.3, substeps=4)
    sim.setup()

    x0 = np.array([0.5, 0.7])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    for _ in range(2):
        u0 = mpc.make_step(x0)
        y = sim.make_step(u0)
        x0 = y.reshape(-1)

    err_u = np.max(np.abs(mpc.data._u - ref["mpc"]._u))
    err_x = np.max(np.abs(mpc.data._x - ref["mpc"]._x))
    assert err_u < 1e-8, f"u err {err_u:.2e}"
    assert err_x < 1e-6, f"x err {err_x:.2e}"
