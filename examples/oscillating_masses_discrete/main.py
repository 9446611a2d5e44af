"""Closed-loop discrete oscillating-masses control (mirrors reference
examples/oscillating_masses_discrete/main.py)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc
from template_simulator import template_simulator


def main():
    model = template_model()
    mpc = template_mpc(model)
    simulator = template_simulator(model)
    estimator = dm.estimator.StateFeedback(model)

    np.random.seed(99)
    x0 = np.random.rand(model.n_x) - 0.5
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for k in range(10):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = estimator.make_step(y_next)
        print(f"k={k:2d}  u={float(u0):+.4f}  x={np.round(x0.ravel(), 3)}")

    return mpc, simulator


if __name__ == "__main__":
    main()
