"""Diagnostic: solve the DIP step-0 problem starting FROM the golden
IPOPT solution (reference testing/results/results_dip.pkl, which stores
the full opt_x vector per step).  If the solver certifies in a few
iterations from the known answer, the local (Newton/KKT) machinery is
sound and the DIP failure is purely a globalization/descent-speed
problem; if it cannot, something structural (scaling, a Jacobian row,
the mu floor) is wrong and the globalization work would be aimed at the
wrong target.

Reference flat layout (do_mpc/controller/_mpc.py:1126-1134, struct cat
order): _x[k=0..N, s, j=0..4][6], then _z[k=0..N-1, s, j=0..3][3], then
_u[k][1].  j=-1 of _x is the stage-k node; j=0..3 are the collocation
points of interval k-1 (k=0 carries unused dummies).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
os.environ.setdefault("DOMPC_TPU_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from golden import load_golden  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dip_repro import build  # noqa: E402


def ref_x_idx(k, j):
    return np.arange(6) + 6 * (j + 5 * k)


def ref_z_idx(k, j):
    return 3030 + np.arange(3) + 3 * (j + 4 * k)


def ref_u_idx(k):
    return np.array([4230 + k])


def main():
    step = int(os.environ.get("DOMPC_DIP_GSTEP", "0"))
    tol = float(os.environ.get("DOMPC_DIP_TOL", "1e-4"))
    max_iter = int(os.environ.get("DOMPC_DIP_MAXIT", "60"))
    g = load_golden("results_dip")
    ref = np.asarray(g["mpc"]._opt_x_num[step])

    model, mpc, sim = build(tol, max_iter,
                            bool(int(os.environ.get("DOMPC_DIP_DEBUG",
                                                    "0"))))
    from dompc_tpu.tools._optxview import wrap_opt_x
    w = wrap_opt_x(np.zeros(mpc.n_opt_x), mpc._optx_resolver)
    N = mpc.settings.n_horizon
    for k in range(N + 1):
        w["_x", k, 0, -1] = ref[ref_x_idx(k, 4)].reshape(6, 1)
        if k >= 1:
            for j in range(4):
                w["_x", k, 0, j] = ref[ref_x_idx(k, j)].reshape(6, 1)
    for k in range(N):
        for j in range(4):
            w["_z", k, 0, j] = ref[ref_z_idx(k, j)].reshape(3, 1)
        w["_u", k, 0] = ref[ref_u_idx(k)].reshape(1, 1)

    x0 = np.asarray(g["simulator"]._x[step]) if step else None
    # step 0 initial state: the test's x0 (theta = 0.9*pi)
    sim.x0["theta"] = 0.9 * np.pi
    sim.x0["pos"] = 0
    x0v = sim.x0.data.copy() if step == 0 \
        else np.asarray(g["estimator"]._x[step - 1]) \
        if hasattr(g["estimator"], "_x") else x0
    mpc.opt_x_num = np.asarray(w)
    mpc.opt_p_num = mpc._assemble_opt_p(x0v)
    mpc._lam_warm = np.zeros(mpc.n_opt_lagr + mpc._n_ineq)
    mpc._zl_warm = np.zeros(0)
    mpc._zu_warm = np.zeros(0)
    mpc.flags["initial_run"] = False  # cold path: no dual warm start

    import time
    t0 = time.perf_counter()
    # call the solver directly with primal warm start + warm mu but
    # fresh duals
    import jax.numpy as jnp
    wsm = float(os.environ.get("DOMPC_DIP_GMU", "1e-4"))
    sol = mpc._solve_jit(jnp.asarray(mpc.opt_x_num),
                         jnp.asarray(mpc.opt_p_num),
                         None, jnp.asarray(wsm), None, None)
    dt = time.perf_counter() - t0
    print(f"golden-start step{step}: {dt:.1f}s iters={int(sol.iterations)}"
          f" success={bool(sol.success)} kkt={float(sol.kkt_err):.2e}")
    du = np.asarray(sol.w) - mpc.opt_x_num
    print(f"  |w_sol - w_golden|_inf = {np.abs(du).max():.3e}"
          f"  (u rows: {np.abs(du[mpc._optx_resolver.fields['_u'][1](0,0)]).max():.2e})")


if __name__ == "__main__":
    main()
