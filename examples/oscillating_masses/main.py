"""Oscillating masses: linear discrete MPC closed loop
(mirrors reference examples/oscillating_masses_discrete/main.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm
from dompc_tpu import sym


def template_model():
    m = dm.model.Model("discrete")
    x = m.set_variable("_x", "x", (4, 1))
    u = m.set_variable("_u", "u", (1, 1))
    m.set_expression("cost", sym.sum1(x**2))
    A = np.array([[0.763, 0.460, 0.115, 0.020],
                  [-0.899, 0.763, 0.420, 0.115],
                  [0.115, 0.020, 0.763, 0.460],
                  [0.420, 0.115, -0.899, 0.763]])
    B = np.array([[0.014], [0.063], [0.221], [0.367]])
    m.set_rhs("x", A @ x + B @ u)
    return m.setup()


def template_mpc(model):
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 7
    mpc.settings.t_step = 0.5
    mpc.settings.store_full_solution = True
    mpc.set_objective(mterm=model.aux["cost"], lterm=model.aux["cost"])
    mpc.set_rterm(u=1e-4)
    max_x = np.array([[4.0], [10.0], [4.0], [10.0]])
    mpc.bounds["lower", "_x", "x"] = -max_x
    mpc.bounds["upper", "_x", "x"] = max_x
    mpc.bounds["lower", "_u", "u"] = -0.5
    mpc.bounds["upper", "_u", "u"] = 0.5
    return mpc.setup()


def main():
    model = template_model()
    mpc = template_mpc(model)
    sim = dm.Simulator(model)
    sim.set_param(t_step=0.5)
    sim.setup()
    estimator = dm.estimator.StateFeedback(model)

    np.random.seed(99)
    x0 = np.random.rand(model.n_x) - 0.5
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()

    for k in range(10):
        u0 = mpc.make_step(x0)
        y_next = sim.make_step(u0)
        x0 = estimator.make_step(y_next)
        print(f"k={k:2d}  u={float(u0):+.4f}  x={np.round(x0.ravel(), 3)}")

    dm.data.save_results([mpc, sim], "oscillating_masses", overwrite=True)


if __name__ == "__main__":
    main()
