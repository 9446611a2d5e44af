"""Closed-loop lateral tracking for a scale racing car (mirrors reference
examples/dynamic_bicycle_model/main.py)."""
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

    # X_p, Y_p, Psi, V_x, V_y, W — rolling forward at 0.5 m/s
    x0 = np.array([0.0, 0.0, 0.0, 0.5, 0.0, 0.0])
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "10"))):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = np.asarray(estimator.make_step(y_next)).reshape(-1)
        print(f"k={k:2d}  Delta={float(np.ravel(u0)[0]):+.4f}  d={float(np.ravel(u0)[1]):.4f}"
              f"  Y_p={float(np.ravel(x0)[1]):.4f}  V_x={float(np.ravel(x0)[3]):.3f}")

    return mpc, simulator


if __name__ == "__main__":
    main()
