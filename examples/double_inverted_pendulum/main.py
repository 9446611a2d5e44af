"""Double-inverted-pendulum swing-up closed loop (mirrors reference
examples/double_inverted_pendulum/main.py).  The DAE model needs
consistent algebraic initial values: init_algebraic_variables() solves
for them before the loop.

DOMPC_DIP_N overrides the horizon (default 100 like the reference; use
a smaller value for a quick smoke run)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc
from template_simulator import template_simulator


def main():
    n_horizon = int(os.environ.get("DOMPC_DIP_N", "100"))
    model = template_model()
    mpc = template_mpc(model, n_horizon=n_horizon)
    simulator = template_simulator(model)
    estimator = dm.estimator.StateFeedback(model)

    simulator.x0["theta"] = 0.99 * np.pi
    x0 = simulator.x0.data.copy()
    mpc.x0 = x0
    estimator.x0 = x0
    simulator.init_algebraic_variables()
    mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "3"))):
        u0 = mpc.make_step(x0)
        y_next = simulator.make_step(u0)
        x0 = estimator.make_step(y_next)
        print(f"k={k:2d}  force={float(u0):+.4f}  "
              f"pos={float(x0[0]):+.4f}  theta0={float(x0[1]):+.4f}")

    return mpc, simulator


if __name__ == "__main__":
    main()
