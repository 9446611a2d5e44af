"""TPU-mode correctness gate: 5-step robust-CSTR golden at f32 tolerance.

The CPU test suite pins f64 (tests/conftest.py), so until now the f32 TPU
path was validated only by hand-run benches (r3 VERDICT missing #1).
This script is the automated gate: it runs the reference's 5-step CSTR
closed loop (testing/test_CSTR.py:113-145 semantics) ON THE ACCELERATOR
at the f32 production tolerance and compares the logged trajectories to
the reference IPOPT golden pickle within f32-appropriate bands.

Exit 0 + one JSON line on pass; non-zero on any gate failure.  Run:
    python scripts/tpu_smoke.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import dompc_tpu as dm
    from dompc_tpu import systems
    from golden import load_golden

    backend = jax.default_backend()
    ref = load_golden("results_CSTR")
    model = systems.cstr_model()
    mpc = systems.cstr_mpc(model)
    # f32 production settings: the tightest tolerance the f32 path
    # certifies at 100% (BENCH.md tolerance-matched row)
    mpc.settings.solver_tol = 1e-4
    mpc.settings.solver_max_iter = 60
    mpc._create_solver()
    sim = systems.cstr_simulator(model)

    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    n_steps = 5
    t0 = time.perf_counter()
    succ = []
    for _ in range(n_steps):
        u0 = mpc.make_step(x0)
        x0 = sim.make_step(u0).reshape(-1)
        succ.append(bool(mpc.solver_stats["success"]))
    wall = time.perf_counter() - t0

    x_scale = np.maximum(np.abs(ref["mpc"]._x[:n_steps]), 1.0)
    err_x = (np.abs(mpc.data._x - ref["mpc"]._x[:n_steps])
             / x_scale).max(axis=0)          # per state channel
    u_scaling = np.array([100.0, 2000.0])
    err_u = np.abs(mpc.data._u - ref["mpc"]._u[:n_steps]) / u_scaling
    err_F = float(err_u[:, 0].max())
    err_Q = float(err_u[:, 1].max())

    # f32 gates, set physically (measured at 3x margin: C_a 5.1e-3,
    # C_b 2.2e-3, T_R 4.7e-3, T_K 2.1e-2, F 4.3e-3).  Q_dot sits in the
    # documented near-degenerate band (reduced-Hessian eig ~1e-6): at
    # scaled-KKT 1e-4 it is simply not determined — any value in the
    # certified flat band is optimal, and the closed loop wanders it —
    # so Q_dot is reported but not gated, and T_K (driven directly by
    # Q_dot) gets the widest state band.
    gates = {
        "all_solves_certified": all(succ),
        "Ca_Cb_TR_err<1.5e-2": float(err_x[[0, 1, 2]].max()) < 1.5e-2,
        "TK_err<6e-2": float(err_x[3]) < 6e-2,
        "F_err<1.5e-2": err_F < 1.5e-2,
    }
    print(json.dumps({
        "gate": "tpu_smoke_cstr_5step_golden",
        "backend": backend,
        "dtype": "float32" if not jax.config.jax_enable_x64 else "float64",
        "pass": all(gates.values()),
        "gates": gates,
        "err_x_per_state": [round(float(e), 6) for e in err_x],
        "err_F": round(err_F, 6),
        "err_Q_dot_ungated_degenerate": round(err_Q, 6),
        "success_per_step": succ,
        "wall_s": round(wall, 1)}))
    sys.exit(0 if all(gates.values()) else 1)


if __name__ == "__main__":
    main()
