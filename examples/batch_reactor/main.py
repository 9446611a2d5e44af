"""Closed-loop economic batch-reactor control (mirrors reference
examples/batch_reactor/main.py)."""
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

    X_s_0 = 1.0
    S_s_0 = 0.5
    P_s_0 = 0.0
    V_s_0 = 120.0
    x0 = np.array([X_s_0, S_s_0, P_s_0, V_s_0])
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "5"))):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = estimator.make_step(y_next)
        print(f"k={k:2d}  inp={float(u0):.5f}  "
              f"P_s={float(x0[2]):.4f}  V_s={float(x0[3]):.2f}")

    return mpc, simulator


if __name__ == "__main__":
    main()
