"""Coupled MHE + MPC closed loop on the rotating oscillating masses
(mirrors reference examples/rotating_oscillating_masses_mhe_mpc/main.py):
the MPC sees only the MHE state/parameter estimate; measurements carry
additive noise."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from template_model import template_model
from template_mpc import template_mpc
from template_mhe import template_mhe
from template_simulator import template_simulator


def main():
    model = template_model()
    mpc = template_mpc(model)
    mhe = template_mhe(model)
    simulator = template_simulator(model)

    np.random.seed(99)
    x0_true = np.zeros(model.n_x)
    x0 = np.zeros(model.n_x)
    simulator.x0 = x0_true
    mpc.x0 = x0
    mhe.x0 = x0
    mhe.p_est0 = 2.25e-4
    mpc.set_initial_guess()
    mhe.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "5"))):
        u0 = mpc.make_step(x0)
        v0 = 1e-2 * np.random.randn(model.n_v, 1)
        y_next = simulator.make_step(u0, v0=v0)
        x0 = mhe.make_step(y_next)
        print(f"k={k:2d}  phi_2={float(x0[1]):+.4f}  "
              f"Theta_1_est={float(mhe.p_est0[0]):.3e}")

    return mpc, mhe, simulator


if __name__ == "__main__":
    main()
