"""Closed-loop robust CSTR control (mirrors reference
examples/CSTR/main.py:110-135): model -> MPC -> simulator -> estimator
loop with optional plotting via dompc_tpu.graphics.

Run: python examples/CSTR/main.py  (CPU; first run compiles ~2 min,
cached afterwards)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc
from template_simulator import template_simulator

show_plot = os.environ.get("DOMPC_SHOW_PLOT", "0") == "1"
store_results = False
n_steps = int(os.environ.get("DOMPC_STEPS", "5"))


def main():
    model = template_model()
    mpc = template_mpc(model)
    simulator = template_simulator(model)
    estimator = dm.estimator.StateFeedback(model)

    # initial state
    C_a_0 = 0.8
    C_b_0 = 0.5
    T_R_0 = 134.14
    T_K_0 = 130.0
    x0 = np.array([C_a_0, C_b_0, T_R_0, T_K_0]).reshape(-1, 1)
    mpc.x0 = x0
    simulator.x0 = x0
    estimator.x0 = x0
    mpc.set_initial_guess()

    timer = dm.tools.Timer()
    for k in range(n_steps):
        timer.tic()
        u0 = mpc.make_step(x0)
        timer.toc()
        y_next = simulator.make_step(u0)
        x0 = estimator.make_step(y_next)
        print(f"k={k:2d}  F={float(u0[0]):8.3f}  Q_dot={float(u0[1]):9.2f}"
              f"  C_b={float(x0[1]):.4f}  T_R={float(x0[2]):.2f}")
    timer.info()

    if store_results:
        dm.data.save_results([mpc, simulator], "CSTR_results")

    if show_plot:
        import matplotlib.pyplot as plt
        fig, ax, graphics = dm.graphics.default_plot(mpc.data)
        graphics.plot_results()
        graphics.plot_predictions(t_ind=0)
        graphics.reset_axes()
        plt.show()

    return mpc, simulator


if __name__ == "__main__":
    main()
