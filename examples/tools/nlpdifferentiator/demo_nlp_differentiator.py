"""NLP sensitivity demo (mirrors reference
examples/tools/nlpdifferentiator/demo_nlp_differentiator.py): solve a
small parametric OCP with an ACTIVE inequality, differentiate the
optimal solution w.r.t. the parameter via the active-set KKT
implicit-function theorem, and cross-check against finite differences."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import numpy as np
import dompc_tpu as dm


def build_mpc(x0):
    model = dm.model.Model("continuous")
    x = model.set_variable("_x", "x")
    u = model.set_variable("_u", "u")
    model.set_rhs("x", -0.5 * x + u)
    model.setup()

    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 5
    mpc.settings.t_step = 0.5
    mpc.set_objective(mterm=x ** 2, lterm=x ** 2 + 0.1 * u ** 2)
    mpc.set_rterm(u=0.01)
    # tight input bound that is active at the solution
    mpc.bounds["lower", "_u", "u"] = -0.6
    mpc.bounds["upper", "_u", "u"] = 0.6
    mpc.setup()

    mpc.x0 = np.array([x0])
    mpc.set_initial_guess()
    mpc.make_step(np.array([x0]))
    return mpc


def _u_k(mpc, k):
    """Optimal input at stage k of the last solve."""
    return float(np.ravel(np.asarray(
        mpc.opt_x_num[mpc.layout.sl(("u", k, 0))]))[0])


def main():
    x0 = 2.0
    mpc = build_mpc(x0)
    print(f"u0*(x0={x0}) = {_u_k(mpc, 0):.5f}  (bound -0.6 ACTIVE)")
    print(f"u3*(x0={x0}) = {_u_k(mpc, 3):.5f}  (interior)")

    diff = dm.differentiator.DoMPCDifferentiator(mpc)
    diff.settings.check_LICQ = True
    dx_dp, _ = diff.differentiate()
    x0_sl = mpc._p_sl["x0"]

    sens = {}
    for k in (0, 3):
        u_sl = mpc.layout.sl(("u", k, 0))
        sens[k] = float(np.ravel(np.asarray(dx_dp[u_sl, x0_sl]))[0])
        print(f"IFT  du{k}*/dx0 = {sens[k]:+.6f}")
    print(f"LICQ: {diff.status.LICQ}")

    # finite-difference cross-check: the active-bound input has zero
    # sensitivity; the interior-stage input moves with x0
    eps = 1e-4
    mp, mm = build_mpc(x0 + eps), build_mpc(x0 - eps)
    for k in (0, 3):
        fd = (_u_k(mp, k) - _u_k(mm, k)) / (2 * eps)
        print(f"FD   du{k}*/dx0 = {fd:+.6f}  "
              f"(|err| = {abs(fd - sens[k]):.2e})")

    return sens


if __name__ == "__main__":
    main()
