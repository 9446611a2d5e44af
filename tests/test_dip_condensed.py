"""DAE condensation: nl_cons that does not reference z must not disable
the condensed KKT path (the z interior is Schur-eliminable exactly).

The double-inverted-pendulum family (DAE, deg-3 collocation, obstacle
nl_cons on states only — reference examples/double_inverted_pendulum/
template_mpc.py) is the motivating config; here a trimmed horizon keeps
the test in the fast suite.  The condensed and uncondensed band backends
must produce the same make_step answer to f64 roundoff.
"""
import numpy as np
import pytest

import dompc_tpu as dm

from test_dip import dip_model


def _mpc(model, kkt, n_horizon=8):
    mpc = dm.controller.MPC(model)
    s = mpc.settings
    s.n_horizon = n_horizon
    s.n_robust = 0
    s.t_step = 0.04
    s.collocation_deg = 3
    s.collocation_ni = 1
    s.kkt_solver = kkt
    mterm = model.aux["E_kin"] - model.aux["E_pot"]
    lterm = -model.aux["E_pot"] \
        + 10 * (model.x["pos"] - model.tvp["pos_set"])**2
    mpc.set_objective(mterm=mterm, lterm=lterm)
    mpc.set_rterm(force=0.1)
    mpc.bounds["lower", "_u", "force"] = -4
    mpc.bounds["upper", "_u", "force"] = 4
    mpc.set_nl_cons("obstacles", -model.aux["obstacle_distance"], 0)
    p_template = mpc.get_p_template(1)
    p_template["_p", 0, "m1"] = 0.2
    p_template["_p", 0, "m2"] = 0.2
    mpc.set_p_fun(lambda t: p_template)
    tvp_template = mpc.get_tvp_template()

    def tvp_fun(t):
        for k in range(s.n_horizon + 1):
            tvp_template["_tvp", k, "pos_set"] = -0.8
        return tvp_template
    mpc.set_tvp_fun(tvp_fun)
    mpc.setup()
    return mpc


def test_dip_z_independent_probe_and_condensed_equality():
    model = dip_model()
    x0 = np.zeros(6)
    x0[1:3] = 0.95 * np.pi

    us = {}
    for kkt in ("condensed", "tridiag"):
        mpc = _mpc(model, kkt)
        if kkt == "condensed":
            assert mpc._nl_cons_z_independent()
            assert mpc._condensation_plan() is not None, \
                "z-independent nl_cons must not disable condensation"
        mpc.x0 = x0
        mpc.set_initial_guess()
        us[kkt] = mpc.make_step(x0)
        assert np.all(np.isfinite(us[kkt]))
    diff = float(np.max(np.abs(us["condensed"] - us["tridiag"])))
    assert diff < 1e-7, f"condensed vs band: {diff:.2e}"


def test_z_dependent_nl_cons_still_blocks_condensation():
    model = dip_model()

    mpc = dm.controller.MPC(model)
    s = mpc.settings
    s.n_horizon = 4
    s.t_step = 0.04
    s.collocation_deg = 3
    mpc.set_objective(mterm=model.aux["E_kin"],
                      lterm=model.aux["E_kin"])
    mpc.set_rterm(force=0.1)
    # constraint referencing an algebraic variable: must keep the
    # conservative fallback
    mpc.set_nl_cons("zcap", model.z["ddpos"], 100.0)
    p_template = mpc.get_p_template(1)
    p_template["_p", 0, "m1"] = 0.2
    p_template["_p", 0, "m2"] = 0.2
    mpc.set_p_fun(lambda t: p_template)
    tvp_template = mpc.get_tvp_template()
    mpc.set_tvp_fun(lambda t: tvp_template)
    mpc.setup()
    assert not mpc._nl_cons_z_independent()
    assert mpc._condensation_plan() is None
