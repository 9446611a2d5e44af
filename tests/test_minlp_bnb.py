"""Batched branch-and-bound MINLP (reference delegates to BONMIN,
do_mpc/controller/_mpc.py:1317-1324; here solver/minlp.py).

A discrete scalar MINLP whose continuous relaxation is genuinely
fractional, small enough to brute-force every integer input sequence: the
B&B incumbent must equal the brute-force optimum exactly — something
rounding the relaxation does NOT achieve here."""
import itertools

import numpy as np
import pytest

import dompc_tpu as dm


A_DYN, TARGET, RFAC = 0.5, 2.3, 0.05
N_HOR, U_MAX = 3, 3


def _make_mpc(strategy):
    m = dm.model.Model("discrete")
    x = m.set_variable("_x", "x")
    u = m.set_variable("_u", "u", input_type_integer=True)
    m.set_rhs("x", A_DYN * x + u)
    m.setup()
    mpc = dm.controller.MPC(m)
    s = mpc.settings
    s.n_horizon = N_HOR
    s.t_step = 1.0
    s.minlp_strategy = strategy
    cost = (m.x["x"] - TARGET) ** 2
    mpc.set_objective(lterm=cost, mterm=cost)
    mpc.set_rterm(u=RFAC)
    mpc.bounds["lower", "_x", "x"] = -10
    mpc.bounds["upper", "_x", "x"] = 10
    mpc.bounds["lower", "_u", "u"] = 0
    mpc.bounds["upper", "_u", "u"] = U_MAX
    mpc.setup()
    return mpc


def _exact_cost(x0, u_seq, u_prev=0.0):
    """The transcription objective: sum_k lterm(x_k, u_k) + rterm deltas,
    plus mterm(x_N)."""
    cost, x, up = 0.0, float(x0), float(u_prev)
    for u in u_seq:
        cost += (x - TARGET) ** 2 + RFAC * (u - up) ** 2
        x = A_DYN * x + u
        up = u
    return cost + (x - TARGET) ** 2


def _brute_force(x0):
    best, best_seq = np.inf, None
    for seq in itertools.product(range(U_MAX + 1), repeat=N_HOR):
        c = _exact_cost(x0, seq)
        if c < best:
            best, best_seq = c, seq
    return best, best_seq


def test_bnb_finds_exact_integer_optimum():
    x0 = np.array([0.3])
    best, best_seq = _brute_force(x0[0])

    mpc = _make_mpc("bnb")
    mpc.x0 = x0
    mpc.set_initial_guess()
    u0 = mpc.make_step(x0)

    # the relaxation is fractional here, so B&B really had to branch
    assert mpc.solver_stats["bnb_nodes"] > 0, mpc.solver_stats
    assert abs(u0[0, 0] - best_seq[0]) < 1e-6, (u0, best_seq)

    # full incumbent sequence integral and exactly brute-force optimal
    L = mpc.layout
    u_seq = [float(mpc.opt_x_num[L.sl(("u", k, 0))][0])
             for k in range(N_HOR)]
    assert np.allclose(u_seq, np.round(u_seq), atol=1e-8), u_seq
    assert abs(_exact_cost(x0[0], u_seq) - best) < 1e-6, (u_seq, best_seq)


def test_bnb_beats_rounding():
    """x0 chosen so the rounded relaxation is suboptimal."""
    x0 = np.array([0.3])
    best, _ = _brute_force(x0[0])

    mpc_r = _make_mpc("round")
    mpc_r.x0 = x0
    mpc_r.set_initial_guess()
    mpc_r.make_step(x0)
    L = mpc_r.layout
    u_round = [float(mpc_r.opt_x_num[L.sl(("u", k, 0))][0])
               for k in range(N_HOR)]
    cost_round = _exact_cost(x0[0], np.round(u_round))

    mpc_b = _make_mpc("bnb")
    mpc_b.x0 = x0
    mpc_b.set_initial_guess()
    mpc_b.make_step(x0)
    u_bnb = [float(mpc_b.opt_x_num[L.sl(("u", k, 0))][0])
             for k in range(N_HOR)]
    cost_bnb = _exact_cost(x0[0], u_bnb)

    assert cost_bnb <= cost_round + 1e-9, (cost_bnb, cost_round)
    assert abs(cost_bnb - best) < 1e-6


def test_bnb_closed_loop_warm_start():
    """B&B composes with the receding-horizon warm start: several steps,
    every applied input integral, solver healthy each step."""
    mpc = _make_mpc("bnb")
    sim = dm.Simulator(mpc.model)
    sim.set_param(t_step=1.0)
    sim.setup()
    x0 = np.array([0.3])
    mpc.x0 = x0
    sim.x0 = x0
    mpc.set_initial_guess()
    for _ in range(4):
        u0 = mpc.make_step(x0)
        assert abs(u0[0, 0] - round(u0[0, 0])) < 1e-8, u0
        assert mpc.solver_stats["kkt_err"] < 1e-6
        x0 = sim.make_step(u0).reshape(-1)
    # closed loop drives x toward the target's integer-feasible vicinity
    assert abs(x0[0] - TARGET) < 1.0, x0
