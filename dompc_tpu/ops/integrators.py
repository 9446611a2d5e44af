"""Fixed-step jit/vmap-able ODE/DAE integrators.

TPU-native replacement for the SUNDIALS CVODES/IDAS integrators the reference
delegates to (do_mpc/simulator.py:399-416, do_mpc/estimator/_ekf.py:162-180).
Adaptive-step host-side C libraries do not map to XLA; instead we use
fixed-substep implicit Radau IIA collocation (stiff + index-1 DAE capable,
order 2*deg-1) and explicit RK4 (non-stiff), both pure JAX with static shapes:
`lax.scan` over substeps, full Newton with `jax.jacfwd` on the stage system.

All functions have signature ``f(x, z, args) -> dx/dt`` and
``g(x, z, args) -> alg residual`` where ``args`` is an arbitrary pytree
(closed over u, tvp, p, w by the caller).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .collocation import lagrange_matrices


def rk4_step(f, x, args, h):
    k1 = f(x, args)
    k2 = f(x + 0.5 * h * k1, args)
    k3 = f(x + 0.5 * h * k2, args)
    k4 = f(x + h * k3, args)
    return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def make_ode_integrator(f, method="radau", substeps=1, deg=3, newton_iters=8,
                        newton_tol=1e-12):
    """Integrator for a pure ODE ``f(x, args) -> xdot`` over one interval h.

    Returns ``step(x0, args, h) -> x(h)``.
    """
    if method == "rk4":
        def step(x0, args, h):
            hs = h / substeps
            def body(x, _):
                return rk4_step(f, x, args, hs), None
            x, _ = jax.lax.scan(body, x0, None, length=substeps)
            return x
        return step

    f_dae = lambda x, z, args: f(x, args)
    g_dae = lambda x, z, args: jnp.zeros((0,), dtype=x.dtype)
    dae = make_dae_integrator(f_dae, g_dae, n_z=0, substeps=substeps, deg=deg,
                              newton_iters=newton_iters, newton_tol=newton_tol)

    def step(x0, args, h):
        x, _ = dae(x0, jnp.zeros((0,), dtype=x0.dtype), args, h)
        return x
    return step


def make_radau_stage_solver(f, g, n_z, deg=3, newton_iters=8,
                            newton_tol=1e-12):
    """One implicit Radau IIA collocation step for an index-1 DAE.

    ``f(x, z, args) -> xdot``; ``g(x, z, args) -> residual (n_z,)``.
    Returns ``newton_solve(x0, z0, args, h) -> (x(h), z(h))``.

    The stage system is the same collocation form the reference's optimizer
    uses (do_mpc/optimizer.py:942-983): with node values X_0=x0, X_1..X_s at
    Radau points, require sum_r C[r,j] X_r = h f(X_j, Z_j) and g(X_j, Z_j)=0,
    j=1..s; Radau includes the right endpoint so x(h)=X_s, z(h)=Z_s.
    """
    tau, C, D = lagrange_matrices(deg, "radau")
    C = jnp.asarray(C)
    s = deg  # number of unknown stages

    def stage_residual(xs_flat, x0, z_flat, args, h):
        nx = x0.shape[0]
        Cd = C.astype(x0.dtype)   # keep f32 states f32 under enabled x64
        X = xs_flat.reshape(s, nx)               # stages 1..s
        Z = z_flat.reshape(s, n_z) if n_z else jnp.zeros((s, 0), x0.dtype)
        Xall = jnp.concatenate([x0[None, :], X], axis=0)   # (s+1, nx)
        res = []
        for j in range(1, s + 1):
            xp_j = jnp.einsum("r,rn->n", Cd[:, j], Xall)    # poly derivative
            f_j = f(X[j - 1], Z[j - 1], args)
            res.append(h * f_j - xp_j)
        for j in range(1, s + 1):
            if n_z:
                res.append(g(X[j - 1], Z[j - 1], args))
        return jnp.concatenate(res)

    def newton_solve(x0, z0, args, h):
        nx = x0.shape[0]
        # initial guess: constant extrapolation
        y = jnp.concatenate([jnp.tile(x0, s), jnp.tile(z0, s)])

        def resid(y):
            xs = y[: s * nx]
            zs = y[s * nx:]
            return stage_residual(xs, x0, zs, args, h)

        jac = jax.jacfwd(resid)

        def body(carry):
            y, it, err = carry
            r = resid(y)
            J = jac(y)
            dy = jnp.linalg.solve(J, -r)
            y_new = y + dy
            return y_new, it + 1, jnp.max(jnp.abs(dy))

        def cond(carry):
            _, it, err = carry
            return jnp.logical_and(it < newton_iters, err > newton_tol)

        y, _, _ = jax.lax.while_loop(
            cond, body, (y, 0, jnp.asarray(jnp.inf, y.dtype)))
        X_end = y[(s - 1) * nx: s * nx]
        Z_end = y[s * nx + (s - 1) * n_z:] if n_z else z0
        return X_end, Z_end

    return newton_solve


def make_dae_integrator(f, g, n_z, substeps=1, deg=3, newton_iters=8,
                        newton_tol=1e-12):
    """Fixed-substep Radau IIA integrator: ``step(x0, z0, args, h)``."""
    newton_solve = make_radau_stage_solver(f, g, n_z, deg=deg,
                                           newton_iters=newton_iters,
                                           newton_tol=newton_tol)

    def step(x0, z0, args, h):
        hs = h / substeps

        def body(carry, _):
            x, z = carry
            x, z = newton_solve(x, z, args, hs)
            return (x, z), None

        (x, z), _ = jax.lax.scan(body, (x0, z0), None, length=substeps)
        return x, z

    return step


def make_adaptive_dae_integrator(f, g, n_z, deg=3, abstol=1e-10,
                                 reltol=1e-10, newton_iters=12,
                                 init_substeps=4, max_steps=10_000):
    """Error-controlled Radau IIA integrator honoring abstol/reltol.

    This is the TPU-native stand-in for the reference's CVODES/IDAS
    tolerances (do_mpc/simulator.py:90-97, abstol/reltol = 1e-10): local
    error is estimated by step doubling (one step of h vs two of h/2;
    Richardson factor 2^p - 1 with p = 2*deg - 1) and the step size follows
    the classic I-controller h <- h * (1/err)^(1/(p+1)).  Static shapes —
    the time stepping is a ``lax.while_loop`` whose trip count is data-
    dependent but bounded by ``max_steps``, so the function jits and vmaps.

    Returns ``step(x0, z0, args, h_total) -> (x(h_total), z(h_total))``.
    """
    p_order = 2 * deg - 1
    newton_tol = max(min(abstol, reltol) * 1e-2, 1e-15)
    newton_solve = make_radau_stage_solver(f, g, n_z, deg=deg,
                                           newton_iters=newton_iters,
                                           newton_tol=newton_tol)
    rich = float(2 ** p_order - 1)

    def step(x0, z0, args, h_total):
        dtype = x0.dtype
        # dtype-achievable tolerance floor: asking float32 for 1e-10
        # leaves the step-doubling error estimate saturated at rounding
        # noise, so steps shrink toward max_steps and the trajectory
        # degrades (caught by scripts/tpu_smoke.py); clamp to ~50 eps
        eps = jnp.finfo(dtype).eps
        abstol_e = jnp.maximum(jnp.asarray(abstol, dtype), 50 * eps)
        reltol_e = jnp.maximum(jnp.asarray(reltol, dtype), 50 * eps)

        def body(carry):
            t, x, z, h, count = carry
            h_eff = jnp.minimum(h, h_total - t)
            x1, z1 = newton_solve(x, z, args, h_eff)       # single step
            xh, zh = newton_solve(x, z, args, 0.5 * h_eff)  # two half steps
            x2, z2 = newton_solve(xh, zh, args, 0.5 * h_eff)
            scale = abstol_e + reltol_e * jnp.maximum(jnp.abs(x),
                                                      jnp.abs(x2))
            err = jnp.max(jnp.abs(x2 - x1) / scale) / rich
            err = jnp.where(jnp.isfinite(err), err, jnp.inf)
            accept = err <= 1.0
            t_n = jnp.where(accept, t + h_eff, t)
            x_n = jnp.where(accept, x2, x)
            z_n = jnp.where(accept, z2, z) if n_z else z
            fac = 0.9 * jnp.where(err > 0, err, 1e-16) ** (-1.0 /
                                                           (p_order + 1))
            fac = jnp.clip(jnp.where(jnp.isfinite(fac), fac, 0.2), 0.2, 5.0)
            h_n = jnp.minimum(h_eff * fac, h_total)
            return (t_n, x_n, z_n, h_n, count + 1)

        def cond(carry):
            t, _, _, _, count = carry
            return (t < h_total * (1.0 - 1e-12)) & (count < max_steps)

        h0 = jnp.asarray(h_total / init_substeps, dtype)
        t_f, x_f, z_f, _, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0.0, dtype), x0, z0, h0, 0))
        return x_f, z_f

    return step


def newton_rootfind(g, z0, args, iters=20, tol=1e-12):
    """Solve g(z, args) = 0 for z by damped Newton (replaces the reference's
    IPOPT-as-rootfinder for discrete DAE models, do_mpc/simulator.py:363-378)."""
    jac = jax.jacfwd(lambda z: g(z, args))

    def body(carry):
        z, it, err = carry
        r = g(z, args)
        J = jac(z)
        dz = jnp.linalg.solve(J, -r)
        return z + dz, it + 1, jnp.max(jnp.abs(dz))

    def cond(carry):
        _, it, err = carry
        return jnp.logical_and(it < iters, err > tol)

    z, _, _ = jax.lax.while_loop(
        cond, body, (z0, 0, jnp.asarray(jnp.inf, z0.dtype)))
    return z
