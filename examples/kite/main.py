"""Closed-loop kite power generation (mirrors reference
examples/kite/main.py): figure-eight flying that maximizes tether force
while honoring the soft minimum-height constraint."""
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

    x0 = np.array([0.5, 0.3, 0.0])  # theta, phi, psi
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "10"))):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = np.asarray(estimator.make_step(y_next)).reshape(-1)
        height = 400.0 * np.sin(x0[0]) * np.cos(x0[1])
        print(f"k={k:2d}  u_tilde={float(np.ravel(u0)[0]):+.4f}  height={height:7.2f} m")

    return mpc, simulator


if __name__ == "__main__":
    main()
