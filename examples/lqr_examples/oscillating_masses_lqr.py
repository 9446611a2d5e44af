"""Discrete LQR on the oscillating masses (mirrors reference
examples/lqr_examples/oscillating_masses_discrete_lqr/main.py):
infinite-horizon gain from the DARE (doubling iteration, no scipy),
input-rate penalization via state augmentation."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm


def template_model():
    model = dm.model.LinearModel("discrete")
    model.set_variable("_x", "x", (4, 1))
    model.set_variable("_u", "u", (1, 1))
    A = np.array([[0.763, 0.460, 0.115, 0.020],
                  [-0.899, 0.763, 0.420, 0.115],
                  [0.115, 0.020, 0.763, 0.460],
                  [0.420, 0.115, -0.899, 0.763]])
    B = np.array([[0.014], [0.063], [0.221], [0.367]])
    model.setup(A, B)
    return model


def template_lqr(model):
    lqr = dm.controller.LQR(model)
    lqr.settings.t_step = 0.5
    lqr.settings.n_horizon = None     # infinite horizon
    lqr.set_objective(Q=np.identity(4), R=np.identity(1))
    lqr.set_rterm(delR=np.identity(1))
    lqr.setup()
    return lqr


def main():
    model = template_model()
    lqr = template_lqr(model)
    simulator = dm.Simulator(model)
    simulator.set_param(t_step=0.5)
    simulator.setup()

    x0 = np.array([[2.0], [1.0], [3.0], [1.0]])
    simulator.x0 = x0
    for k in range(20):
        u0 = lqr.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = y_next
        if k % 4 == 0:
            print(f"k={k:2d}  u={float(u0):+.4f}  "
                  f"|x|={float(np.linalg.norm(x0)):.4f}")

    return lqr, simulator


if __name__ == "__main__":
    main()
