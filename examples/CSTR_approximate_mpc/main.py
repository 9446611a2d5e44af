"""Approximate (neural-network) MPC for the CSTR (mirrors reference
examples/CSTR_approximate_mpc/main.py): sample the robust MPC with
BATCHED on-device solves — the reference runs its 10k solves in a
sequential Python loop (main.py:94-97); here one vmapped interior-point
call solves a whole batch per dispatch — then train an MLP policy and
run it in closed loop.

DOMPC_AMPC_SAMPLES controls the dataset size (default small for a quick
demo; raise it for a production policy)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "CSTR"))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc
from template_simulator import template_simulator


def main():
    n_samples = int(os.environ.get("DOMPC_AMPC_SAMPLES", "64"))
    model = template_model()
    mpc = template_mpc(model)
    # the reference's approximate-MPC variant uses a dedicated template
    # with a FINITE T_R upper bound (reference
    # examples/CSTR_approximate_mpc/template_mpc.py:80) — required for
    # the NN's min-max input scaling; the shared robust template leaves
    # T_R soft-constrained/unbounded.  Re-run setup() so the bound also
    # enters the sampled NLPs (bounds are baked at transcription time).
    mpc.bounds["upper", "_x", "T_R"] = 140.0
    mpc.setup()

    # --- sampling: batched one-step MPC solves over a state box ---------
    sampler_settings = dm.approximateMPC.AMPCSamplerSettings(
        n_samples=n_samples, data_dir="./ampc_data/")
    sampler = dm.approximateMPC.AMPCSampler(mpc, sampler_settings)
    # sample an interior sub-box (box corners can be infeasible)
    lbx = np.array([0.2, 0.2, 100.0, 100.0])
    ubx = np.array([1.8, 1.8, 138.0, 138.0])
    plan = sampler.default_sampling_plan(seed=0, lbx=lbx, ubx=ubx)
    X, U_prev, U, OK = sampler.sample_open_loop_batched(
        plan, batch_size=min(32, n_samples), tol=1e-4, max_iter=60)
    print(f"sampled {len(X)} states, solver success rate {OK.mean():.2f}")
    full, opt = sampler.save_dataset(X, U_prev, U, OK)

    # --- training -------------------------------------------------------
    approx = dm.approximateMPC.ApproxMPC(mpc)
    trainer_settings = dm.approximateMPC.TrainerSettings(
        n_epochs=400, batch_size=32, learning_rate=3e-3,
        print_frequency=0)
    trainer = dm.approximateMPC.Trainer(approx, trainer_settings)
    hist = trainer.default_training(opt["x0"], opt["u_opt"],
                                    U_prev=opt["u_prev"], seed=0)
    print(f"train loss {hist['train_loss'][0]:.4f} -> "
          f"{hist['train_loss'][-1]:.4f}")

    # --- closed loop with the learned policy ----------------------------
    simulator = template_simulator(model)
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    simulator.x0 = x0.copy()
    u_prev = np.array([5.0, 0.0])
    for k in range(int(os.environ.get("DOMPC_STEPS", "5"))):
        u0 = approx.make_step(x0, u_prev=u_prev, clip_to_bounds=True)
        y_next = simulator.make_step(u0.reshape(-1, 1))
        x0 = np.asarray(y_next).reshape(-1)
        u_prev = u0.reshape(-1)
        print(f"k={k:2d}  F={u_prev[0]:8.3f}  Q_dot={u_prev[1]:9.2f}  "
              f"C_b={x0[1]:.4f}")

    approx.save_to_state_dict("./ampc_data/policy.pkl")
    return approx


if __name__ == "__main__":
    main()
