"""Batched and sharded NMPC solves.

Replaces the reference's sequential sampling studies (SURVEY.md §2.3,
do_mpc/sampling/_sampler.py:230-242 and
examples/tools/sampling/multiprocessing/*) with on-device batching: one
compiled interior-point solve serves a whole batch of (x0, u_prev, p)
problem instances via ``vmap``; ``shard_map`` over a device mesh scales the
batch across chips with XLA collectives over ICI.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solver.ipm import make_ipm_solver, IPMSettings


def batch_mesh(n_devices=None, axis_name="batch"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def initial_guess_from_x0(mpc, x0s):
    """Per-instance primal initial guess: broadcast each x0 into every state
    slot (the batched analogue of MPC.set_initial_guess)."""
    L = mpc.layout
    n = L.size
    xs = mpc._x_scaling.data
    map_x = -np.ones(n, int)
    for key in L.offsets:
        if key[0] == "x_node":
            map_x[L.sl(key)] = np.arange(mpc.model.n_x)
        elif key[0] == "x_coll":
            map_x[L.sl(key)] = np.tile(np.arange(mpc.model.n_x),
                                       mpc.n_total_coll_points)
    base = np.zeros(n)
    for key in L.offsets:
        if key[0] == "u":
            base[L.sl(key)] = mpc._u0.data / mpc._u_scaling.data
        elif key[0] == "z":
            nrep = L.sizes[key] // max(mpc.model.n_z, 1)
            base[L.sl(key)] = np.tile(
                mpc._z0.data / mpc._z_scaling.data, nrep)
    x0s = np.asarray(x0s, dtype=float)
    scaled = x0s / xs[None, :]
    w0s = np.tile(base, (x0s.shape[0], 1))
    mask = map_x >= 0
    w0s[:, mask] = scaled[:, map_x[mask]]
    return w0s


def make_batch_solver(mpc, tol=1e-6, max_iter=60, use_structured=True,
                      warm=True, throughput_mode=False, rti_iters=0,
                      chunk=None, **ipm_overrides):
    """Return ``solve_batch(x0s, w0s, lam0s=None, mu0=None, zl0s=None,
    zu0s=None)``: a jitted vmapped solver over problem instances of the
    given MPC.

    ``x0s``: (B, n_x) initial states; ``w0s``: (B, n_w_opt) primal initial
    guesses (e.g. broadcast of mpc.opt_x_num).  Returns the IPMSolution
    pytree with a leading batch axis plus the per-instance first input
    u0 = w[u(0,0)] * scaling.

    ``throughput_mode`` trims the compile/runtime fat (shorter
    regularization ladder, one refinement pass, no polish) — right for
    large-batch moderate-tolerance solves on accelerators.

    ``rti_iters > 0`` enables real-time-iteration mode for warm-started
    calls (lam0s given): exactly that many Newton steps at fixed mu, no
    convergence loop — the acados-style receding-horizon hot path.  Cold
    calls (lam0s=None) still run the full globalized loop.

    ``chunk`` tiles the batch at the program level: batches larger than
    this solve as sequential sub-batches of at most ``chunk`` through the
    same compiled program.  This is the working-set fix for B >= 256 on
    one v5e (measured r3: 1017 solves/s at B=256 vs 1288 at B=128 — past
    ~23k instance chains the per-instance KKT blocks spill HBM locality);
    chunked sub-batches also stop slow elements from stalling the whole
    batch in lockstep.  Batch sizes must be a multiple of ``chunk``.
    """
    st = mpc.settings
    if throughput_mode or rti_iters:
        # the retry rungs and the second-order correction now zero-trip
        # skip when no batch element needs them (solver/ipm.py:_cond_any),
        # so they no longer cost a KKT sweep per iteration — but any
        # element triggering them still stalls the whole batch for that
        # trip, so throughput mode keeps them off and lets the non-finite
        # step guard + adaptive prox damping carry robustness
        kw = dict(tol=tol, max_iter=max_iter,
                  reg_retries=0, use_soc=False,
                  do_polish=False, rti_iters=rti_iters,
                  # restoration's _cond_any adds a fusion-splitting
                  # while boundary to the hot loop (~17 ms/iter at
                  # B=128 even with zero trips) — off here, alpha_min
                  # fallback carries failures
                  use_resto=False)
        kw.update(ipm_overrides)   # explicit overrides win
        ipm_settings = IPMSettings(**kw)
        n_refine = 1
    else:
        ipm_settings = IPMSettings(tol=tol, max_iter=max_iter,
                                   **ipm_overrides)
        n_refine = 3
    structured = None
    if use_structured and hasattr(mpc, "_struct_parts"):
        if hasattr(mpc, "_make_kkt_backend"):
            structured = mpc._make_kkt_backend(ipm_settings.delta_cons,
                                               n_refine=n_refine)
        else:  # MHE: bordered band only
            structured = mpc._make_structured_solve(
                ipm_settings.delta_cons, n_refine=n_refine)
    solve = make_ipm_solver(
        mpc._f_fn, mpc._g_fn, mpc._h_fn,
        mpc._lb_opt_x, mpc._ub_opt_x,
        mpc.n_opt_lagr, mpc._n_ineq, settings=ipm_settings,
        hess_fn=mpc._hess_fn, grad_f_fn=mpc._grad_f_fn,
        jac_g_fn=mpc._jac_g_fn, jac_h_fn=mpc._jac_h_fn,
        structured_solve=structured)

    base_pvec = jnp.asarray(mpc._assemble_opt_p(np.zeros(mpc.model.n_x)))
    x0_sl = mpc._p_sl["x0"]
    u_sl = mpc.layout.sl(("u", 0, 0))
    u_scaling = jnp.asarray(mpc._u_scaling.data)

    def one_cold(x0, w0):
        pvec = base_pvec.at[x0_sl].set(x0)
        sol = solve(w0, pvec)
        u0 = sol.w[u_sl] * u_scaling
        return sol, u0

    def one_warm(x0, w0, lam0, mu0, zl0, zu0):
        pvec = base_pvec.at[x0_sl].set(x0)
        sol = solve(w0, pvec, lam0=lam0, mu0=mu0, zl0=zl0, zu0=zu0)
        u0 = sol.w[u_sl] * u_scaling
        return sol, u0

    cold = jax.jit(jax.vmap(one_cold))
    warm_jit = jax.jit(jax.vmap(one_warm))

    # Cold-start emulation through the warm program: with lam0=0,
    # mu0=mu_init and the z_init pattern passed as zl0/zu0, init_state's
    # warm branch reproduces the cold initialization bit-for-bit (entries
    # > 1e-12 restart at max(z_init, mu/1e8) = z_init; the rest follow the
    # same bounded-pattern masks).  One compiled program then serves both
    # cold and warm calls — through the remote-compile tunnel the second
    # large program was most of bench.py's compile_plus_first_s.  Not
    # applicable in RTI mode, where cold calls must run the full
    # globalized loop instead of the fixed-iteration RTI path.
    has_lb_np = np.isfinite(np.asarray(mpc._lb_opt_x))
    has_ub_np = np.isfinite(np.asarray(mpc._ub_opt_x))
    z0v = ipm_settings.z_init
    _zl_cold = np.concatenate([np.where(has_lb_np, z0v, 0.0),
                               np.full(mpc._n_ineq, z0v)])
    _zu_cold = np.concatenate([np.where(has_ub_np, z0v, 0.0),
                               np.zeros(mpc._n_ineq)])
    n_lagr_tot = mpc.n_opt_lagr + mpc._n_ineq

    def solve_batch(x0s, w0s, lam0s=None, mu0=None, zl0s=None, zu0s=None):
        B = x0s.shape[0]
        if chunk and B > chunk:
            assert B % chunk == 0, (
                f"batch {B} must be a multiple of chunk {chunk}")
            outs = []
            for i in range(0, B, chunk):
                sl = slice(i, i + chunk)
                outs.append(solve_batch(
                    x0s[sl], w0s[sl],
                    None if lam0s is None else lam0s[sl],
                    mu0 if (mu0 is None or jnp.ndim(mu0) == 0)
                    else mu0[sl],
                    None if zl0s is None else zl0s[sl],
                    None if zu0s is None else zu0s[sl]))
            sols, u0s = zip(*outs)
            sol = jax.tree.map(lambda *xs: jnp.concatenate(xs), *sols)
            return sol, jnp.concatenate(u0s)
        if lam0s is None:
            if ipm_settings.rti_iters > 0:
                # genuine cold program: globalized loop
                return cold(x0s, w0s)
            lam0s = jnp.zeros((B, n_lagr_tot), x0s.dtype)
            mu0 = jnp.full((B,), ipm_settings.mu_init, x0s.dtype)
            zl0s = jnp.broadcast_to(jnp.asarray(_zl_cold, x0s.dtype),
                                    (B, _zl_cold.shape[0]))
            zu0s = jnp.broadcast_to(jnp.asarray(_zu_cold, x0s.dtype),
                                    (B, _zu_cold.shape[0]))
            return warm_jit(x0s, w0s, lam0s, mu0, zl0s, zu0s)
        if mu0 is None:
            mu0 = jnp.full((B,), st.warm_start_mu, x0s.dtype)
        if zl0s is None:
            # zeros fall through init_state's z_init default per-entry
            zl0s = jnp.zeros((B, w0s.shape[1] + mpc._n_ineq), x0s.dtype)
            zu0s = jnp.zeros((B, w0s.shape[1] + mpc._n_ineq), x0s.dtype)
        return warm_jit(x0s, w0s, lam0s, mu0, zl0s, zu0s)

    return solve_batch


def make_shift_fn(mpc):
    """Receding-horizon warm-start shift for batched solutions.

    Returns ``shift(sol) -> (w, lam, zl, zu)`` advancing an IPMSolution by
    one stage along the nominal scenario branch (last stage duplicated) —
    the acados-style RTI warm start.  Works on (B, ...) batches or single
    vectors (indexes the last axis)."""
    maps = mpc._build_shift_maps()
    iw = jnp.asarray(maps["w"])
    il = jnp.asarray(maps["lam"])
    iz = jnp.asarray(maps["z"])

    def shift(sol):
        return (sol.w[..., iw], sol.lam[..., il],
                sol.zl[..., iz], sol.zu[..., iz])

    return shift


def make_sharded_solver(mpc, mesh=None, tol=1e-6, max_iter=60,
                        axis_name="batch", use_structured=True,
                        throughput_mode=False, warm=False):
    """Shard the batch axis over a device mesh with ``shard_map``.

    Each device solves its shard with the vmapped solver; the success count
    is reduced with ``psum`` over ICI so every host sees the global rate.
    The batch size must divide the mesh size.  ``warm=True`` returns a
    function additionally accepting (lam0s, mu0s, zl0s, zu0s) for
    receding-horizon warm starts.
    """
    shard_map = jax.shard_map

    if mesh is None:
        mesh = batch_mesh(axis_name=axis_name)
    solve_batch = make_batch_solver(mpc, tol=tol, max_iter=max_iter,
                                    use_structured=use_structured,
                                    throughput_mode=throughput_mode)

    def local_solve(x0s, w0s):
        sol, u0 = solve_batch(x0s, w0s)
        n_ok = jax.lax.psum(jnp.sum(sol.success.astype(jnp.float32)),
                            axis_name)
        return u0, sol.iterations, n_ok

    def local_solve_warm(x0s, w0s, lam0s, mu0s, zl0s, zu0s):
        sol, u0 = solve_batch(x0s, w0s, lam0s, mu0s, zl0s, zu0s)
        n_ok = jax.lax.psum(jnp.sum(sol.success.astype(jnp.float32)),
                            axis_name)
        return u0, sol.iterations, n_ok

    if warm:
        sharded = shard_map(
            local_solve_warm, mesh=mesh,
            in_specs=(P(axis_name),) * 6,
            out_specs=(P(axis_name), P(axis_name), P()),
            check_vma=False)
    else:
        sharded = shard_map(
            local_solve, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P()),
            check_vma=False)
    return jax.jit(sharded), mesh


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the JAX distributed runtime for multi-host meshes.

    The reference scales sampling studies across processes by file-locking
    (do_mpc/sampling/_sampler.py:218 + mp.Pool examples); the TPU-native
    equivalent is one jax process per host joined into a global device
    mesh over DCN.  Arguments default to the standard env variables
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) and the call is a
    no-op when neither arguments nor env are present (single host).

    Returns True when the distributed runtime was initialized."""
    import os as _os
    coordinator_address = (coordinator_address
                           or _os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    kw = {}
    if num_processes is None and "NUM_PROCESSES" in _os.environ:
        num_processes = int(_os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in _os.environ:
        process_id = int(_os.environ["PROCESS_ID"])
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(coordinator_address, **kw)
    return True
