"""Batched + sharded solves on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

import dompc_tpu as dm
from dompc_tpu.parallel import make_batch_solver, make_sharded_solver, \
    batch_mesh
import systems


def _mpc():
    model = systems.oscillating_masses_model()
    return systems.oscillating_masses_mpc(model), model


def test_batched_solves_match_sequential():
    mpc, model = _mpc()
    rng = np.random.default_rng(0)
    B = 8
    x0s = rng.uniform(-0.5, 0.5, size=(B, 4))
    mpc.x0 = x0s[0]
    mpc.set_initial_guess()
    w0 = mpc.opt_x_num.copy()
    solve_batch = make_batch_solver(mpc, tol=1e-8, max_iter=80)
    sol, u0s = solve_batch(jnp.asarray(x0s),
                           jnp.asarray(np.tile(w0, (B, 1))))
    assert bool(jnp.all(sol.success))
    # sequential reference via make_step
    for i in range(B):
        mpc2, _ = _mpc()
        mpc2.x0 = x0s[i]
        mpc2.set_initial_guess()
        u_seq = mpc2.make_step(x0s[i])
        np.testing.assert_allclose(np.asarray(u0s[i]).reshape(-1),
                                   u_seq.reshape(-1), atol=1e-6)


def test_chunked_batch_matches_unchunked():
    """Program-level batch tiling (chunk=) must be arithmetically
    invisible: same solutions, cold and warm paths."""
    mpc, model = _mpc()
    rng = np.random.default_rng(3)
    B = 8
    x0s = rng.uniform(-0.5, 0.5, size=(B, 4))
    mpc.x0 = x0s[0]
    mpc.set_initial_guess()
    w0s = jnp.asarray(np.tile(mpc.opt_x_num.copy(), (B, 1)))
    x0s = jnp.asarray(x0s)
    full = make_batch_solver(mpc, tol=1e-8, max_iter=80)
    tiled = make_batch_solver(mpc, tol=1e-8, max_iter=80, chunk=4)
    sol_f, u_f = full(x0s, w0s)
    sol_c, u_c = tiled(x0s, w0s)
    np.testing.assert_array_equal(np.asarray(u_f), np.asarray(u_c))
    # warm path with the previous solution
    sol_f2, u_f2 = full(x0s * 1.001, sol_f.w, sol_f.lam,
                        jnp.full((B,), 1e-4), sol_f.zl, sol_f.zu)
    sol_c2, u_c2 = tiled(x0s * 1.001, sol_c.w, sol_c.lam,
                         jnp.full((B,), 1e-4), sol_c.zl, sol_c.zu)
    np.testing.assert_array_equal(np.asarray(u_f2), np.asarray(u_c2))
    assert bool(jnp.all(sol_c2.success))


def test_sharded_solver_8_devices():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mpc, model = _mpc()
    mpc.x0 = np.zeros(4)
    mpc.set_initial_guess()
    w0 = mpc.opt_x_num.copy()
    rng = np.random.default_rng(1)
    B = 16  # 2 per device
    x0s = rng.uniform(-0.5, 0.5, size=(B, 4))
    sharded, mesh = make_sharded_solver(mpc, tol=1e-8, max_iter=80)
    u0s, iters, n_ok = sharded(jnp.asarray(x0s),
                               jnp.asarray(np.tile(w0, (B, 1))))
    assert float(n_ok) == B
    assert u0s.shape == (B, 1)
    assert np.all(np.abs(np.asarray(u0s)) <= 0.5 + 1e-9)


def test_cold_emulation_matches_true_cold_program():
    """Cold-start calls route through the warm program (one compile
    serves both — see make_batch_solver); the synthesized dual init must
    reproduce the genuine cold program bit-for-bit.  The rti_iters>0
    solver still owns a real cold program (the globalized loop), which
    here doubles as the reference."""
    mpc, model = _mpc()
    rng = np.random.default_rng(3)
    B = 4
    x0s = rng.uniform(-0.5, 0.5, size=(B, 4))
    mpc.x0 = x0s[0]
    mpc.set_initial_guess()
    w0 = np.tile(mpc.opt_x_num.copy(), (B, 1))

    emulated = make_batch_solver(mpc, tol=1e-8, max_iter=80,
                                 throughput_mode=True)
    true_cold = make_batch_solver(mpc, tol=1e-8, max_iter=80,
                                  throughput_mode=True, rti_iters=1)
    sol_e, u_e = emulated(jnp.asarray(x0s), jnp.asarray(w0))
    sol_c, u_c = true_cold(jnp.asarray(x0s), jnp.asarray(w0))
    assert bool(jnp.all(sol_e.success))
    np.testing.assert_array_equal(np.asarray(sol_e.iterations),
                                  np.asarray(sol_c.iterations))
    np.testing.assert_array_equal(np.asarray(sol_e.w), np.asarray(sol_c.w))
    np.testing.assert_array_equal(np.asarray(u_e), np.asarray(u_c))
