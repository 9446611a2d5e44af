"""Warm-start shift maps (parallel.make_shift_fn / MPC._build_shift_maps):
index semantics on a scenario-tree MPC."""
import numpy as np

import dompc_tpu as dm
from dompc_tpu import sym


def _robust_mpc(N=5, n_robust=1):
    m = dm.model.Model("discrete")
    x = m.set_variable("_x", "x", (2, 1))
    u = m.set_variable("_u", "u", (1, 1))
    p = m.set_variable("_p", "p")
    m.set_rhs("x", 0.9 * x + np.array([[1.0], [0.5]]) @ u + p * x)
    m.setup()
    mpc = dm.controller.MPC(m)
    mpc.settings.n_horizon = N
    mpc.settings.n_robust = n_robust
    mpc.settings.t_step = 0.1
    mpc.set_objective(mterm=sym.sum1(m.x["x"] ** 2),
                      lterm=sym.sum1(m.x["x"] ** 2))
    mpc.set_rterm(u=1e-3)
    mpc.bounds["lower", "_u", "u"] = -1
    mpc.bounds["upper", "_u", "u"] = 1
    mpc.set_uncertainty_values(p=np.array([0.0, 0.05]))
    mpc.setup()
    return mpc


def test_shift_map_is_valid_and_advances_stages():
    mpc = _robust_mpc()
    maps = mpc._build_shift_maps()
    L = mpc.layout
    n = L.size
    src_w = maps["w"]
    assert src_w.shape == (n,)
    assert np.all((0 <= src_w) & (src_w < n))

    # x_node(k, s) sources from x_node(k+1, nominal child)
    tree = mpc.scenario_tree
    child = tree["child_scenario"]
    N = mpc.settings.n_horizon
    for k in range(N):
        for s in range(tree["n_scenarios"][k]):
            dst = L.idx(("x_node", k, s))
            src = L.idx(("x_node", k + 1, child[k][s][0]))
            np.testing.assert_array_equal(src_w[dst], src)
    # last stage duplicated
    for s in range(tree["n_scenarios"][N]):
        dst = L.idx(("x_node", N, s))
        np.testing.assert_array_equal(src_w[dst], dst)

    # duals: valid permutation-ish indices
    m, q = mpc.n_opt_lagr, mpc._n_ineq
    assert maps["lam"].shape == (m + q,)
    assert np.all((0 <= maps["lam"]) & (maps["lam"] < m + q))
    assert maps["z"].shape == (n + q,)


def test_shifted_warm_start_still_converges():
    import jax.numpy as jnp
    from dompc_tpu.parallel import make_batch_solver, make_shift_fn

    mpc = _robust_mpc()
    shift = make_shift_fn(mpc)
    solve = make_batch_solver(mpc, tol=1e-8, max_iter=60)
    x0 = np.array([1.0, -0.5])
    mpc.x0 = x0
    mpc.set_initial_guess()
    W = jnp.asarray(mpc.opt_x_num[None, :])
    X = jnp.asarray(x0[None, :])
    sol, u = solve(X, W)
    assert bool(sol.success[0])
    wS, lS, zlS, zuS = shift(sol)
    X2 = X * 0.95
    sol2, u2 = solve(X2, wS, lS, jnp.full((1,), 1e-6), zlS, zuS)
    assert bool(sol2.success[0])
    # shifted warm start should converge at least as fast as cold
    sol2c, _ = solve(X2, W)
    assert int(sol2.iterations[0]) <= int(sol2c.iterations[0])
