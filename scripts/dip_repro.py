"""Double-inverted-pendulum solver lab: reproduce + iterate on the DIP
N=100 convergence failure (the r4-diagnosed l1-merit limit cycle,
BENCH.md r4 item 3).

Runs the DIP closed loop on CPU f64 printing per-step solver stats
(iters / success / kkt_err), and optionally saves each step's pre-solve
warm state to an npz so solver experiments can replay a single failing
solve without the closed loop.

Env knobs:
  DOMPC_DIP_STEPS   closed-loop steps (default 3)
  DOMPC_DIP_TOL     solver tol (default 1e-4)
  DOMPC_DIP_MAXIT   max iterations (default 60)
  DOMPC_DIP_DEBUG   1 -> per-iteration jax.debug prints
  DOMPC_DIP_SAVE    path prefix to save warm states (optional)
  DOMPC_DIP_REPLAY  path of a saved state: replay that single solve
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
F32 = bool(int(os.environ.get("DOMPC_DIP_F32", "0")))
if not F32:
    os.environ.setdefault("DOMPC_TPU_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")
if not F32:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

import dompc_tpu as dm  # noqa: E402
from dompc_tpu import systems  # noqa: E402


def build(tol, max_iter, debug):
    model = systems.dip_model()
    mpc = systems.dip_mpc(model)
    mpc.settings.solver_tol = tol
    mpc.settings.solver_max_iter = max_iter
    if os.environ.get("DOMPC_DIP_KKT"):
        mpc.settings.kkt_solver = os.environ["DOMPC_DIP_KKT"]
    if debug:
        from dompc_tpu.solver.ipm import ipm_settings_from
        # rebuild with debug prints (bypasses _create_solver defaults)
        mpc.settings.nlpsol_opts = dict(mpc.settings.nlpsol_opts)
    mpc._create_solver()
    overrides = os.environ.get("DOMPC_DIP_OVERRIDES")
    if debug or overrides:
        import json
        import dompc_tpu.solver.ipm as ipm_mod
        st = ipm_mod.ipm_settings_from(mpc.settings)
        kw = dict(st.__dict__)
        kw["debug"] = debug
        if overrides:
            kw.update(json.loads(overrides))
        st = ipm_mod.IPMSettings(**kw)
        sp = mpc._make_kkt_backend(st.delta_cons)
        solve = ipm_mod.make_ipm_solver(
            mpc._f_fn, mpc._g_fn, mpc._h_fn, mpc._lb_opt_x,
            mpc._ub_opt_x, mpc.n_opt_lagr, mpc._n_ineq, settings=st,
            hess_fn=mpc._hess_fn, grad_f_fn=mpc._grad_f_fn,
            jac_g_fn=mpc._jac_g_fn, jac_h_fn=mpc._jac_h_fn,
            structured_solve=sp)
        mpc._solve_jit = jax.jit(solve)
    sim = systems.dip_simulator(model)
    return model, mpc, sim


def decode_indices(mpc, idxs):
    """Map opt_x indices -> layout keys (which stage/kind blocks them)."""
    L = mpc.layout
    for i in idxs:
        for key in L.offsets:
            sl = L.sl(key)
            if sl.start <= i < sl.stop:
                print(f"  w[{i}] -> {key} (+{i - sl.start})")
                break


def main():
    tol = float(os.environ.get("DOMPC_DIP_TOL", "1e-4"))
    max_iter = int(os.environ.get("DOMPC_DIP_MAXIT", "60"))
    n_steps = int(os.environ.get("DOMPC_DIP_STEPS", "3"))
    debug = bool(int(os.environ.get("DOMPC_DIP_DEBUG", "0")))
    save = os.environ.get("DOMPC_DIP_SAVE")
    replay = os.environ.get("DOMPC_DIP_REPLAY")

    model, mpc, sim = build(tol, max_iter, debug)
    est = dm.estimator.StateFeedback(model)

    if replay:
        d = np.load(replay)
        mpc.opt_x_num = d["w"]
        mpc.opt_p_num = d["p"]
        mpc._lam_warm = d["lam"]
        mpc._zl_warm = d["zl"]
        mpc._zu_warm = d["zu"]
        mpc.flags["initial_run"] = bool(d["warm"])
        t0 = time.perf_counter()
        mpc.solve()
        dt = time.perf_counter() - t0
        print(f"replay: {dt:.1f}s  iters={mpc.solver_stats['iter_count']}"
              f" success={mpc.solver_stats['success']}"
              f" kkt={mpc.solver_stats['kkt_err']:.2e}")
        if os.environ.get("DOMPC_DIP_LAMDUMP"):
            lam = np.asarray(mpc.lam_g_num)
            m_eq = mpc.n_opt_lagr
            E = mpc._rows_per_inst
            n_x = model.n_x
            lam_ic = lam[:n_x]
            lam_st = lam[n_x:m_eq].reshape(-1, E)
            lam_h = lam[m_eq:]
            print(f"|lam_ic| max {np.abs(lam_ic).max():.2e}")
            st_max = np.abs(lam_st).max(axis=1)
            print("per-stage max |lam| (first 20):",
                  np.array2string(st_max[:20], precision=1))
            print("worst stages:", np.argsort(st_max)[-8:],
                  np.sort(st_max)[-8:])
            within = np.abs(lam_st[np.argmax(st_max)])
            print("worst stage row profile:",
                  np.array2string(within, precision=1))
            if lam_h.size:
                hm = np.abs(lam_h).reshape(-1, mpc._nl_rows_per_inst)
                print("h rows: max", hm.max(),
                      "worst stages:", np.argsort(hm.max(axis=1))[-8:])
        return

    sim.x0["theta"] = 0.9 * np.pi
    sim.x0["pos"] = 0
    x0 = sim.x0.data.copy()
    mpc.x0 = x0
    est.x0 = x0
    mpc.set_initial_guess()
    sim.init_algebraic_variables()

    for k in range(n_steps):
        if save:
            warm = mpc.flags["initial_run"]
            nl = mpc.n_opt_lagr + mpc._n_ineq
            np.savez(f"{save}_step{k}.npz",
                     w=mpc.opt_x_num,
                     p=mpc._assemble_opt_p(x0),
                     lam=(mpc._lam_warm if warm else np.zeros(nl)),
                     zl=(mpc._zl_warm if warm else np.zeros(0)),
                     zu=(mpc._zu_warm if warm else np.zeros(0)),
                     warm=np.array(warm))
        t0 = time.perf_counter()
        u0 = mpc.make_step(x0)
        dt = time.perf_counter() - t0
        print(f"step {k}: {dt:6.1f}s  "
              f"iters={mpc.solver_stats['iter_count']:3d}  "
              f"success={mpc.solver_stats['success']}  "
              f"kkt={mpc.solver_stats['kkt_err']:.2e}  "
              f"u={float(u0[0]):+.4f}", flush=True)
        y_next = sim.make_step(u0)
        x0 = est.make_step(y_next)


if __name__ == "__main__":
    main()
