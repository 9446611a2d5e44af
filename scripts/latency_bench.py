"""Per-step solve latency on the five BASELINE.md reference configs.

BASELINE.md target row 4: "per-step solve latency competitive with IPOPT
``t_wall_total`` on the same 5 configs".  This measures the library
surface the way the reference records it (do_mpc/optimizer.py:467-475):
closed-loop ``make_step`` with the solver's wall time logged per step.
Warm latency = mean ``t_wall_total`` over the post-warmup steps (the
receding-horizon regime; the first step carries compile+cold-start and is
reported separately).

Single-instance (B=1) on whatever accelerator JAX resolves; through the
remote-compile tunnel the per-call dispatch RTT is included — i.e. these
are honest end-to-end numbers for THIS host, an upper bound on on-device
latency.

Prints one JSON line per config.  DOMPC_LAT_TOL sets the solver tol
(default 1e-4 scaled KKT — the tightest the f32 TPU path reaches
reliably, see bench.py; IPOPT's default 1e-8 is below f32 resolution.
On CPU/f64 pass DOMPC_LAT_TOL=1e-8 for golden-grade latency).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_mpc_loop(name, model, mpc, sim, x0, n_steps=8):
    import dompc_tpu as dm
    est = None
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    xk = x0
    t0 = time.perf_counter()
    u0 = mpc.make_step(xk)
    first = time.perf_counter() - t0
    walls, iters, succ, kkts = [], [], [], []
    for _ in range(n_steps - 1):
        y = sim.make_step(u0)
        xk = y.reshape(-1)
        t0 = time.perf_counter()
        u0 = mpc.make_step(xk)
        walls.append(time.perf_counter() - t0)
        iters.append(mpc.solver_stats["iter_count"])
        succ.append(mpc.solver_stats["success"])
        kkts.append(float(mpc.solver_stats.get("kkt_err", float("nan"))))
    warm = walls[2:] if len(walls) > 4 else walls
    print(json.dumps({
        "config": name,
        "warm_ms_per_step": round(1e3 * float(np.mean(warm)), 2),
        "warm_ms_min": round(1e3 * float(np.min(warm)), 2),
        "first_step_s": round(first, 1),
        "iters": iters,
        "success": succ,
        "kkt_err": [f"{k:.1e}" for k in kkts],
        "n_warm_steps": len(warm)}), flush=True)


def main():
    import jax
    # DOMPC_LAT_PLATFORM=cpu gives the IPOPT-comparable regime (f64 host
    # latency, no remote-dispatch RTT); pair with DOMPC_TPU_X64=1 and a
    # tight DOMPC_LAT_TOL.  Must run before any backend use.
    plat = os.environ.get("DOMPC_LAT_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import dompc_tpu as dm
    from dompc_tpu import systems

    tol = float(os.environ.get("DOMPC_LAT_TOL", "1e-4"))
    only = set(sys.argv[1:])

    rti = int(os.environ.get("DOMPC_LAT_RTI", "0"))
    tol_loop = os.environ.get("DOMPC_LAT_TOL_LOOP")

    def tune(mpc):
        # builders run setup(); rebuild the solver at the bench tol
        mpc.settings.solver_tol = tol
        mpc.settings.solver_max_iter = int(
            os.environ.get("DOMPC_LAT_MAXIT", "60"))
        mpc.settings.solver_n_refine_kkt = int(
            os.environ.get("DOMPC_LAT_REFINE", "0"))
        if tol_loop:
            # loose barrier-loop exit + polish certification (B=1
            # latency recipe)
            mpc.settings.solver_tol_loop = float(tol_loop)
        if rti:
            # fixed-iteration warm steps at the warm barrier floor
            mpc.settings.solver_rti_iters = rti
            mpc.settings.warm_start_mu = tol / 10.0
            drift = os.environ.get("DOMPC_LAT_RTI_DRIFT")
            if drift:
                # bounded-drift safeguard (corrective iterations when
                # the KKT error leaves the band)
                mpc.settings.solver_rti_drift_tol = float(drift)
            if os.environ.get("DOMPC_LAT_RTI_FILTER"):
                # filter-RTI hybrid: capped globalized iterations
                # instead of raw damped Newton (the DIP deployment mode)
                mpc.settings.solver_rti_filter = True
        mpc._create_solver()
        return mpc

    if not only or "oscillating_masses" in only:
        model = systems.oscillating_masses_model()
        mpc = tune(systems.oscillating_masses_mpc(model))
        sim = dm.Simulator(model)
        sim.set_param(t_step=0.5)
        sim.setup()
        run_mpc_loop("oscillating_masses", model, mpc, sim,
                     np.array([2.0, 1.0, 0.0, 0.0]))

    if not only or "batch_reactor" in only:
        model = systems.batch_reactor_model()
        mpc = tune(systems.batch_reactor_mpc(model))
        sim = dm.Simulator(model)
        sim.set_param(t_step=1.0, substeps=4)
        p_num = sim.get_p_template()
        p_num["Y_x"] = 0.5
        p_num["S_in"] = 200.0
        sim.set_p_fun(lambda t: p_num)
        sim.setup()
        run_mpc_loop("batch_reactor", model, mpc, sim,
                     np.array([1.0, 0.5, 0.0, 120.0]))

    if not only or "CSTR" in only:
        model = systems.cstr_model()
        mpc = tune(systems.cstr_mpc(model))
        sim = systems.cstr_simulator(model)
        run_mpc_loop("CSTR_robust", model, mpc, sim,
                     np.array([0.8, 0.5, 134.14, 130.0]))

    if not only or "DIP" in only:
        model = systems.dip_model()
        mpc = tune(systems.dip_mpc(model))
        sim = systems.dip_simulator(model)
        x0 = np.zeros(model.n_x)
        x0[1] = 0.99 * np.pi
        x0[2] = 0.99 * np.pi
        run_mpc_loop("double_inverted_pendulum", model, mpc, sim, x0,
                     n_steps=6)

    if not only or "MHE" in only:
        model = systems.rotating_masses_model()
        mhe = systems.rotating_masses_mhe(model)
        # builder already ran setup(); rebuild the solver at the bench tol
        mhe.settings.solver_tol = tol
        mhe.settings.solver_max_iter = 60
        mhe._create_solver()
        sim = systems.rotating_masses_simulator(model)
        rng = np.random.default_rng(1)
        sim.x0 = rng.random(model.n_x) - 0.5
        mhe.x0 = np.zeros(model.n_x)
        mhe.p_est0 = 1e-4
        mhe.set_initial_guess()
        u0 = np.array([[0.3], [-0.3]])
        y = sim.make_step(u0)
        t0 = time.perf_counter()
        mhe.make_step(y)
        first = time.perf_counter() - t0
        walls = []
        for _ in range(7):
            y = sim.make_step(u0)
            t0 = time.perf_counter()
            mhe.make_step(y)
            walls.append(time.perf_counter() - t0)
        warm = walls[2:]
        print(json.dumps({
            "config": "rotating_masses_MHE",
            "warm_ms_per_step": round(1e3 * float(np.mean(warm)), 2),
            "warm_ms_min": round(1e3 * float(np.min(warm)), 2),
            "first_step_s": round(first, 1),
            "n_warm_steps": len(warm)}), flush=True)


if __name__ == "__main__":
    main()
