"""PyTorch-to-dompc_tpu surrogate MPC (mirrors reference
examples/tools/pytorch_2_do-mpc/main.py).  The reference loads
pretrained weights from disk; here the 3-10-2 Tanh net is trained
in-script on trajectories of the real plant (torch CPU, a few seconds),
converted into a discrete surrogate model, and used for closed-loop MPC
against the real simulator."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import numpy as np
import torch

from template_converter import template_converter
from template_model import template_model
from template_simulator import template_simulator
from template_mpc import template_mpc


def generate_data(simulator, n_traj=64, n_steps=20, seed=0):
    """Rollouts of the real plant under random inputs -> (x,u) -> x' pairs."""
    rng = np.random.default_rng(seed)
    X, Y = [], []
    for _ in range(n_traj):
        x = rng.uniform([-0.01, -0.0265], [0.01, 0.0265])
        simulator.x0 = x
        simulator.set_initial_guess()
        for _ in range(n_steps):
            u = rng.uniform(-0.1, 0.1, size=(1, 1))
            x_next = np.asarray(simulator.make_step(u)).reshape(-1)
            X.append(np.concatenate([x, u.reshape(-1)]))
            Y.append(x_next)
            x = x_next
    return (torch.tensor(np.array(X), dtype=torch.float64),
            torch.tensor(np.array(Y), dtype=torch.float64))


def train_nn(X, Y, epochs=400):
    torch.manual_seed(0)
    nn_model = torch.nn.Sequential(
        torch.nn.Linear(3, 10), torch.nn.Tanh(),
        torch.nn.Linear(10, 2)).double()
    opt = torch.optim.Adam(nn_model.parameters(), lr=1e-2)
    # normalize inputs/outputs into the net's weights would complicate the
    # converter; the state range is small, so plain MSE works here
    for ep in range(epochs):
        opt.zero_grad()
        loss = torch.mean((nn_model(X) - Y) ** 2)
        loss.backward()
        opt.step()
    print(f"train MSE after {epochs} epochs: {loss.item():.3e}")
    return nn_model


def main():
    real_model = template_model()
    real_simulator = template_simulator(real_model)

    X, Y = generate_data(template_simulator(real_model))
    nn_model = train_nn(X, Y,
                        epochs=int(os.environ.get("DOMPC_EPOCHS", "400")))

    surrogate_model = template_converter(nn_model)
    surrogate_mpc = template_mpc(surrogate_model)

    x0 = np.array([0.004, 0.0])
    real_simulator.x0 = x0
    real_simulator.set_initial_guess()
    surrogate_mpc.x0 = x0
    surrogate_mpc.set_initial_guess()

    for k in range(int(os.environ.get("DOMPC_STEPS", "25"))):
        u0 = surrogate_mpc.make_step(x0)
        x0 = np.asarray(real_simulator.make_step(u0)).reshape(-1)
        if k % 5 == 0:
            print(f"k={k:2d}  u={float(np.ravel(u0)[0]):+.5f}  "
                  f"pos={x0[0]:+.5f}  vel={x0[1]:+.5f}")

    print(f"final |position| = {abs(x0[0]):.2e} (surrogate-driven MPC)")
    return surrogate_mpc, real_simulator


if __name__ == "__main__":
    main()
