"""Struct-indexed opt_x_num access (reference power-index parity).

Reference users index the full NLP solution directly, e.g.
``mpc.opt_x_num['_x', k, s, -1]`` (do_mpc/controller/_mpc.py:1126-1134);
these tests pin the grafted view in tools/_optxview.py against the flat
layout it is backed by.
"""
import numpy as np
import pytest

from __graft_entry__ import _build_cstr_mpc


@pytest.fixture(scope="module")
def mpc():
    m = _build_cstr_mpc(n_horizon=6, n_robust=1)
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    m.x0 = x0
    m.set_initial_guess()
    m.make_step(x0)
    return m


def test_node_and_collocation_indexing(mpc):
    L = mpc.layout
    flat = np.asarray(mpc.opt_x_num)
    tree = mpc.scenario_tree
    nscen = tree["n_scenarios"]
    n_x = mpc.model.n_x
    n_coll = mpc.n_total_coll_points
    # node state: last collocation index
    for k in (0, 2, mpc.settings.n_horizon):
        for s in range(nscen[k]):
            got = mpc.opt_x_num["_x", k, s, -1]
            np.testing.assert_array_equal(
                got, flat[L.sl(("x_node", k, s))])
    # interior collocation point j of interval k-1
    got = mpc.opt_x_num["_x", 2, 1, 0]
    np.testing.assert_array_equal(
        got, flat[L.idx(("x_coll", 1, 1))[:n_x]])
    # scenario clamp: beyond-width scenario aliases the last live one
    np.testing.assert_array_equal(
        mpc.opt_x_num["_x", 0, nscen[-1] - 1, -1],
        flat[L.sl(("x_node", 0, nscen[0] - 1))])
    # k=0 interior points are reference dummy entries -> explicit error
    with pytest.raises(IndexError):
        mpc.opt_x_num["_x", 0, 0, 0]
    # slice over the collocation axis returns the point list
    pts = mpc.opt_x_num["_x", 2, 0, :-1]
    assert isinstance(pts, list) and len(pts) == n_coll


def test_u_indexing_and_names(mpc):
    L = mpc.layout
    flat = np.asarray(mpc.opt_x_num)
    np.testing.assert_array_equal(mpc.opt_x_num["_u", 0, 0],
                                  flat[L.sl(("u", 0, 0))])
    # trailing variable name selects the block
    spec = mpc.model.spec("_u")
    name = spec.names[0]
    np.testing.assert_array_equal(
        mpc.opt_x_num["_u", 0, 0, name],
        flat[L.sl(("u", 0, 0))][spec.slice(name)])
    # unscaled view carries the same indexing
    got = mpc.opt_x_num_unscaled["_u", 0, 0]
    np.testing.assert_allclose(
        got, flat[L.sl(("u", 0, 0))] * mpc._u_scaling.data)


def test_setitem_mutates_flat_vector(mpc):
    L = mpc.layout
    mpc.opt_x_num["_u", 1, 0] = 0.1234
    np.testing.assert_allclose(
        np.asarray(mpc.opt_x_num)[L.sl(("u", 1, 0))], 0.1234)
    mpc.opt_x_num["_x", 3, 0, -1] = np.arange(mpc.model.n_x) * 0.1
    np.testing.assert_allclose(
        np.asarray(mpc.opt_x_num)[L.sl(("x_node", 3, 0))],
        np.arange(mpc.model.n_x) * 0.1)


def test_plain_indexing_unchanged(mpc):
    flat = np.asarray(mpc.opt_x_num)
    np.testing.assert_array_equal(mpc.opt_x_num[:10], flat[:10])
    assert float(mpc.opt_x_num[3]) == float(flat[3])
    # arithmetic falls back to plain numpy semantics
    assert isinstance(mpc.opt_x_num + 1.0, np.ndarray)


def test_mhe_view():
    from dompc_tpu.systems import (rotating_masses_model,
                                   rotating_masses_mhe)
    model = rotating_masses_model()
    mhe = rotating_masses_mhe(model)
    L = mhe.layout
    mhe.opt_x_num[:] = np.random.default_rng(0).standard_normal(L.size)
    flat = np.asarray(mhe.opt_x_num)
    np.testing.assert_array_equal(mhe.opt_x_num["_x", 1, -1],
                                  flat[L.sl(("x_node", 1, 0))])
    np.testing.assert_array_equal(mhe.opt_x_num["_p_est"],
                                  flat[L.sl(("p_est",))])
    np.testing.assert_array_equal(mhe.opt_x_num["_p_est", "Theta_1"],
                                  flat[L.sl(("p_est",))])
    np.testing.assert_array_equal(mhe.opt_x_num["_v", 2],
                                  flat[L.sl(("v", 2))])
