"""NLP sensitivities of the batch-reactor MPC (mirrors reference
examples/batch_reactor_differentiator/main.py): solve the MPC once, then
differentiate the optimal solution w.r.t. the parameters (x0) via the
active-set KKT implicit-function theorem and report du0/dx0."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "batch_reactor"))

import numpy as np
import dompc_tpu as dm

from template_model import template_model
from template_mpc import template_mpc


def main():
    model = template_model()
    mpc = template_mpc(model)

    x0 = np.array([1.0, 0.5, 0.0, 120.0])
    mpc.x0 = x0
    mpc.set_initial_guess()
    u0 = mpc.make_step(x0)
    print("u0 =", u0.reshape(-1))

    diff = dm.differentiator.DoMPCDifferentiator(mpc)
    diff.settings.check_LICQ = True
    dx_dp, dlam_dp = diff.differentiate()

    u_sl = mpc.layout.sl(("u", 0, 0))
    x0_sl = mpc._p_sl["x0"]
    du0_dx0 = dx_dp[u_sl, x0_sl]
    print("du0/dx0 =")
    print(np.array2string(np.asarray(du0_dx0), precision=5))
    print("LICQ:", diff.status.LICQ)

    return du0_dx0


if __name__ == "__main__":
    main()
