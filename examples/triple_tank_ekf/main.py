"""EKF state estimation on the triple tank (mirrors reference
examples/triple_tank_ekf/main.py): the plant starts at the true level,
the EKF at a wrong guess; only tank 3 is measured (with noise), and the
filter reconstructs all three levels."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_ekf import template_ekf
from template_simulator import template_simulator


def main():
    model = template_model()
    simulator = template_simulator(model)
    ekf = template_ekf(model)

    np.random.seed(1)
    Q = np.diag(1e-3 * np.ones(model.n_x))
    R = np.diag(1e-2 * np.ones(model.n_y))

    x0_true = np.array([2, 2.8, 2.7])
    x0_guess = np.array([1.2, 1.4, 1.8])
    simulator.x0 = x0_true
    ekf.x0 = x0_guess
    simulator.set_initial_guess()
    ekf.set_initial_guess()

    n_sim = int(os.environ.get("DOMPC_STEPS", "200"))
    for k in range(n_sim):
        u0 = np.array([[0.0001], [0.0001]])
        y_next = simulator.make_step(
            u0, v0=0.001 * np.random.randn(model.n_v, 1))
        x_hat = ekf.make_step(y_next=y_next, u_next=u0, Q_k=Q, R_k=R)

    x_true = simulator.data._x[-1]
    err = np.abs(np.asarray(x_hat).reshape(-1) - x_true)
    print(f"after {n_sim} steps: true levels = {np.round(x_true, 4)}")
    print(f"estimate err = {np.round(err, 4)}  (est={np.round(np.asarray(x_hat).reshape(-1), 4)})")

    return simulator, ekf


if __name__ == "__main__":
    main()
