"""Batched primal-dual interior-point NLP solver.

TPU-native replacement for IPOPT (reference delegates every MPC/MHE solve to
``casadi.nlpsol('ipopt')``, do_mpc/controller/_mpc.py:1328,
do_mpc/optimizer.py:731-787).  A single jit-compiled Fiacco-McCormick
monotone-barrier loop with exact-Hessian primal-dual Newton steps,
fraction-to-boundary rule, l1-merit backtracking line search and inertia-free
regularization.  Everything is static-shape ``lax.while_loop`` so the solver
``vmap``s across problem instances (thousands of batched NMPC solves per
chip) — the design target of SURVEY.md §7.

Problem form (matches what the transcription emits):

    min_w f(w, p)   s.t.  g(w, p) = 0,  h(w, p) <= 0,  lb <= w <= ub

Inequalities get slacks s >= 0 with h + s = 0; bounds are handled by a log
barrier on both w and s.  The KKT system is condensed to (w, lam_g, lam_h)
and solved densely by default; a structured (block-tridiagonal Riccati)
factorization can be plugged in via ``kkt_solve``.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class IPMSettings:
    tol: float = 1e-8
    max_iter: int = 200
    mu_init: float = 1e-1
    kappa_eps: float = 10.0     # inner loop: E_mu <= kappa_eps * mu
    kappa_mu: float = 0.2       # linear mu decrease factor
    theta_mu: float = 1.5       # superlinear mu decrease power
    tau_min: float = 0.99       # fraction-to-boundary
    bound_push: float = 1e-2    # kappa_1: relative initial push into interior
    bound_frac: float = 1e-2    # kappa_2
    slack_min: float = 1e-8
    ls_max: int = 25            # max halvings in line search
    delta_reg: float = 1e-8     # base primal regularization
    delta_cons: float = 1e-11   # dual regularization (keeps KKT nonsingular)
    s_max: float = 100.0        # KKT error scaling (IPOPT's s_max)


class IPMState(NamedTuple):
    w: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray      # equality multipliers [g; h+s]
    zl: jnp.ndarray       # lower bound duals for [w; s]
    zu: jnp.ndarray       # upper bound duals for [w; s]
    mu: jnp.ndarray
    it: jnp.ndarray
    converged: jnp.ndarray
    kkt_err: jnp.ndarray


class IPMSolution(NamedTuple):
    w: jnp.ndarray
    s: jnp.ndarray
    lam: jnp.ndarray
    zl: jnp.ndarray
    zu: jnp.ndarray
    f: jnp.ndarray
    kkt_err: jnp.ndarray
    iterations: jnp.ndarray
    success: jnp.ndarray


def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def make_ipm_solver(
    f: Callable, g: Callable, h: Callable,
    lb, ub, n_eq: int, n_ineq: int,
    settings: IPMSettings = IPMSettings(),
    kkt_solve: Optional[Callable] = None,
    hess_fn: Optional[Callable] = None,
    grad_f_fn: Optional[Callable] = None,
    jac_g_fn: Optional[Callable] = None,
    jac_h_fn: Optional[Callable] = None,
):
    """Build a single-instance solver ``solve(w0, p, lam0=None) -> IPMSolution``.

    All of f/g/h take (w, p).  ``lb/ub`` are static numpy arrays (may contain
    +-inf).  vmap the returned function for batched solves.

    ``kkt_solve(Hw, Sig_w, Jg, Jh, inv_sig_s, r_dw, r_g, r_h_mod, delta)``
    may exploit problem structure; the default is a dense LU.
    """
    st = settings
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    n = lb.shape[0]
    m, q = n_eq, n_ineq

    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)

    grad_f = grad_f_fn if grad_f_fn is not None else jax.grad(f)
    jac_g = jac_g_fn if jac_g_fn is not None else (
        jax.jacfwd(g) if m else None)
    jac_h = jac_h_fn if jac_h_fn is not None else (
        jax.jacfwd(h) if q else None)

    if hess_fn is None:
        def lagrangian(w, p, lam_g, lam_h):
            val = f(w, p)
            if m:
                val = val + jnp.dot(lam_g, g(w, p))
            if q:
                val = val + jnp.dot(lam_h, h(w, p))
            return val
        hess_fn = jax.hessian(lagrangian)

    def eval_all(w, p):
        gv = g(w, p) if m else jnp.zeros((0,), w.dtype)
        hv = h(w, p) if q else jnp.zeros((0,), w.dtype)
        return gv, hv

    # -- barrier helpers over the combined (w bounds, s >= 0) --------------
    def dist_l(w, s):
        dl_w = jnp.where(has_lb, w - lb, 1.0)
        return dl_w, s  # slack lower bound is 0

    def dist_u(w):
        return jnp.where(has_ub, ub - w, 1.0)

    def barrier_value(w, s, p, mu):
        val = f(w, p)
        dl = jnp.where(has_lb, w - lb, 1.0)
        du = jnp.where(has_ub, ub - w, 1.0)
        val = val - mu * jnp.sum(jnp.where(has_lb, jnp.log(dl), 0.0))
        val = val - mu * jnp.sum(jnp.where(has_ub, jnp.log(du), 0.0))
        if q:
            val = val - mu * jnp.sum(jnp.log(s))
        return val

    def constraint_violation(gv, hv, s):
        vio = jnp.sum(jnp.abs(gv)) if m else 0.0
        if q:
            vio = vio + jnp.sum(jnp.abs(hv + s))
        return vio

    # -- KKT error ---------------------------------------------------------
    def kkt_error(w, s, lam, zl, zu, p, mu):
        gf = grad_f(w, p)
        lam_g = lam[:m]
        lam_h = lam[m:]
        r_dw = gf
        if m:
            r_dw = r_dw + jac_g(w, p).T @ lam_g
        if q:
            r_dw = r_dw + jac_h(w, p).T @ lam_h
        r_dw = r_dw - jnp.where(has_lb, zl[:n], 0.0) \
                    + jnp.where(has_ub, zu[:n], 0.0)
        r_ds = (lam_h - zl[n:]) if q else jnp.zeros((0,), w.dtype)
        gv, hv = eval_all(w, p)
        r_p = jnp.concatenate([gv, hv + s])
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        c_l = jnp.concatenate([
            jnp.where(has_lb, dl_w * zl[:n] - mu, 0.0),
            dl_s * zl[n:] - mu])
        c_u = jnp.where(has_ub, du_w * zu[:n] - mu, 0.0)

        z_sum = jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))
        lam_sum = jnp.sum(jnp.abs(lam))
        denom = n + q + m
        s_d = jnp.maximum(st.s_max,
                          (lam_sum + z_sum) / jnp.maximum(denom, 1)) / st.s_max
        s_c = jnp.maximum(st.s_max,
                          z_sum / jnp.maximum(n + q, 1)) / st.s_max
        err_d = jnp.max(jnp.abs(jnp.concatenate([r_dw, r_ds]))) / s_d
        err_p = jnp.max(jnp.abs(r_p)) if (m + q) else jnp.asarray(0.0)
        err_c = jnp.maximum(jnp.max(jnp.abs(c_l), initial=0.0),
                            jnp.max(jnp.abs(c_u), initial=0.0)) / s_c
        return jnp.maximum(jnp.maximum(err_d, err_p), err_c)

    # -- dense KKT solve ---------------------------------------------------
    def dense_kkt(Hw, Sig_w, Jg, Jh, inv_sig_s, r_dw, r_g, r_h_mod, delta):
        dtype = Hw.dtype
        dim = n + m + q
        K = jnp.zeros((dim, dim), dtype)
        K = K.at[:n, :n].set(Hw + jnp.diag(Sig_w + delta))
        if m:
            K = K.at[:n, n:n + m].set(Jg.T)
            K = K.at[n:n + m, :n].set(Jg)
        if q:
            K = K.at[:n, n + m:].set(Jh.T)
            K = K.at[n + m:, :n].set(Jh)
            K = K.at[n + m:, n + m:].set(-jnp.diag(inv_sig_s))
        K = K.at[n:, n:].add(-st.delta_cons * jnp.eye(m + q, dtype=dtype))
        rhs = jnp.concatenate([-r_dw, -r_g, -r_h_mod])
        sol = jnp.linalg.solve(K, rhs)
        return sol[:n], sol[n:n + m], sol[n + m:]

    solve_kkt = kkt_solve if kkt_solve is not None else dense_kkt

    # -- one Newton iteration at fixed mu ----------------------------------
    def newton_step(w, s, lam, zl, zu, p, mu):
        lam_g, lam_h = lam[:m], lam[m:]
        gf = grad_f(w, p)
        Jg = jac_g(w, p) if m else jnp.zeros((0, n), w.dtype)
        Jh = jac_h(w, p) if q else jnp.zeros((0, n), w.dtype)
        gv, hv = eval_all(w, p)
        Hw = hess_fn(w, p, lam_g, lam_h)

        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        dl_w = jnp.maximum(dl_w, 1e-300)
        du_w = jnp.maximum(du_w, 1e-300)
        dl_s = jnp.maximum(dl_s, 1e-300)

        sig_w = jnp.where(has_lb, zl[:n] / dl_w, 0.0) \
              + jnp.where(has_ub, zu[:n] / du_w, 0.0)
        sig_s = zl[n:] / dl_s

        # barrier-gradient form of the dual residual
        r_dw = gf + (Jg.T @ lam_g if m else 0.0) + (Jh.T @ lam_h if q else 0.0) \
            - jnp.where(has_lb, mu / dl_w, 0.0) + jnp.where(has_ub, mu / du_w, 0.0)
        r_ds = lam_h - mu / dl_s if q else jnp.zeros((0,), w.dtype)
        r_g = gv
        r_h = hv + s

        inv_sig_s = 1.0 / jnp.maximum(sig_s, 1e-300) if q \
            else jnp.zeros((0,), w.dtype)
        r_h_mod = r_h - r_ds * inv_sig_s

        dw, dlam_g, dlam_h = solve_kkt(
            Hw, sig_w, Jg, Jh, inv_sig_s, r_dw, r_g, r_h_mod,
            jnp.asarray(0.0, w.dtype))

        # Retry with escalating primal regularization when the step is bad:
        # non-finite, wrong curvature, or (critical for the unpivoted
        # block-tridiagonal path) an inaccurate linear solve.  Regularizing
        # pushes H+Sigma+delta toward PD, where block elimination is stable.
        rhs_norm = jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(r_dw), initial=0.0),
            jnp.max(jnp.abs(r_g), initial=0.0)),
            jnp.max(jnp.abs(r_h_mod), initial=0.0)) + 1.0

        def step_residual(step, delta):
            dw_, dg_, dh_ = step
            res_w = (Hw @ dw_ + (sig_w + delta) * dw_ + r_dw
                     + (Jg.T @ dg_ if m else 0.0)
                     + (Jh.T @ dh_ if q else 0.0))
            out = jnp.max(jnp.abs(res_w), initial=0.0)
            if m:
                res_g = Jg @ dw_ - st.delta_cons * dg_ + r_g
                out = jnp.maximum(out, jnp.max(jnp.abs(res_g), initial=0.0))
            if q:
                res_h = Jh @ dw_ - inv_sig_s * dh_ - st.delta_cons * dh_ \
                    + r_h_mod
                out = jnp.maximum(out, jnp.max(jnp.abs(res_h), initial=0.0))
            return out

        def need_retry(step, delta):
            dw_, dg_, dh_ = step
            bad = ~jnp.all(jnp.isfinite(dw_)) | ~jnp.all(jnp.isfinite(dg_)) \
                | ~jnp.all(jnp.isfinite(dh_))
            curv = jnp.dot(dw_, (Hw @ dw_)) + jnp.sum(sig_w * dw_ * dw_)
            inaccurate = step_residual(step, delta) > 1e-6 * rhs_norm
            return bad | (curv < -1e-12) | inaccurate

        def retry(delta):
            return solve_kkt(Hw, sig_w, Jg, Jh, inv_sig_s, r_dw, r_g,
                             r_h_mod, jnp.asarray(delta, w.dtype))

        step = (dw, dlam_g, dlam_h)
        prev_delta = jnp.asarray(0.0, w.dtype)
        for delta in (st.delta_reg, 1e-4, 1e-2, 1.0, 1e2, 1e4):
            bad = need_retry(step, prev_delta)
            new_step = jax.lax.cond(bad, lambda: retry(delta), lambda: step)
            step = new_step
            prev_delta = jnp.where(bad, delta, prev_delta)
        dw, dlam_g, dlam_h = step

        ds = -(r_h + Jh @ dw) if q else jnp.zeros((0,), w.dtype)
        dlam = jnp.concatenate([dlam_g, dlam_h])
        # recover bound-dual steps
        dzl_w = jnp.where(has_lb, _safe_div(mu - zl[:n] * dl_w, dl_w)
                          - _safe_div(zl[:n] * dw, dl_w), 0.0)
        dzl_s = _safe_div(mu - zl[n:] * dl_s, dl_s) \
            - _safe_div(zl[n:] * ds, dl_s) if q else jnp.zeros((0,), w.dtype)
        dzu_w = jnp.where(has_ub, _safe_div(mu - zu[:n] * du_w, du_w)
                          + _safe_div(zu[:n] * dw, du_w), 0.0)
        dzl = jnp.concatenate([dzl_w, dzl_s])
        dzu = jnp.concatenate([dzu_w, jnp.zeros((q,), w.dtype)])
        return dw, ds, dlam, dzl, dzu

    # -- fraction to boundary ----------------------------------------------
    def max_alpha(x, dx, dist, active):
        # largest alpha in (0,1] with x + alpha dx >= x - tau*dist
        tau_dist = dist
        ratio = jnp.where(active & (dx < 0), -tau_dist / jnp.where(
            dx == 0, -1.0, dx), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, initial=jnp.inf))

    def fraction_to_boundary(w, s, dw, ds, zl, zu, dzl, dzu, mu):
        tau = jnp.maximum(st.tau_min, 1.0 - mu)
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        a_p = max_alpha(w, dw, tau * dl_w, has_lb)
        a_p = jnp.minimum(a_p, max_alpha(w, -dw, tau * du_w, has_ub))
        if q:
            a_p = jnp.minimum(a_p, max_alpha(s, ds, tau * dl_s,
                                             jnp.ones_like(s, bool)))
        mask_zl = jnp.concatenate([has_lb, jnp.ones((q,), bool)])
        a_d = max_alpha(zl, dzl, tau * zl, mask_zl)
        mask_zu = jnp.concatenate([has_ub, jnp.zeros((q,), bool)])
        a_d = jnp.minimum(a_d, max_alpha(zu, dzu, tau * zu, mask_zu))
        return a_p, a_d

    # -- line search on l1 merit -------------------------------------------
    def line_search(w, s, dw, ds, p, mu, alpha_max, nu):
        phi0 = barrier_value(w, s, p, mu)
        gv, hv = eval_all(w, p)
        vio0 = constraint_violation(gv, hv, s)

        def try_alpha(alpha):
            w_t = w + alpha * dw
            s_t = s + alpha * ds
            phi = barrier_value(w_t, s_t, p, mu)
            gv_t, hv_t = eval_all(w_t, p)
            vio = constraint_violation(gv_t, hv_t, s_t)
            merit0 = phi0 + nu * vio0
            merit = phi + nu * vio
            ok = jnp.isfinite(merit) & (
                (merit <= merit0 - 1e-8 * alpha * jnp.maximum(vio0, 1e-16))
                | (vio <= vio0 * (1 - 1e-4 * alpha))
                | (merit <= merit0 + 1e-12 * jnp.abs(merit0))
            )
            return ok

        def body(carry):
            alpha, k, _ = carry
            ok = try_alpha(alpha)
            return jax.lax.cond(
                ok,
                lambda: (alpha, k + 1, True),
                lambda: (alpha * 0.5, k + 1, False))

        def cond(carry):
            alpha, k, done = carry
            return (~done) & (k < st.ls_max)

        alpha, _, done = jax.lax.while_loop(
            cond, body, (alpha_max, 0, False))
        # if the search failed entirely take a tiny step (keeps progress
        # under vmap; IPOPT would enter feasibility restoration here)
        alpha = jnp.where(done, alpha, alpha_max * (0.5 ** st.ls_max))
        return alpha

    # -- main loop ----------------------------------------------------------
    def solver_loop(state: IPMState, p):
        def cond(stt: IPMState):
            return (~stt.converged) & (stt.it < st.max_iter)

        def body(stt: IPMState):
            w, s, lam, zl, zu, mu = stt.w, stt.s, stt.lam, stt.zl, stt.zu, stt.mu
            err_mu = kkt_error(w, s, lam, zl, zu, p, mu)
            err_0 = kkt_error(w, s, lam, zl, zu, p, 0.0)

            # barrier update when the inner problem is solved
            shrink = err_mu <= st.kappa_eps * mu
            mu_new = jnp.where(
                shrink,
                jnp.maximum(st.tol / 10.0,
                            jnp.minimum(st.kappa_mu * mu, mu ** st.theta_mu)),
                mu)

            dw, ds, dlam, dzl, dzu = newton_step(w, s, lam, zl, zu, p, mu_new)
            a_p, a_d = fraction_to_boundary(w, s, dw, ds, zl, zu, dzl, dzu,
                                            mu_new)
            nu = jnp.maximum(1.0, 2.0 * jnp.max(
                jnp.abs(lam + dlam), initial=0.0))
            alpha = line_search(w, s, dw, ds, p, mu_new, a_p, nu)

            w_n = w + alpha * dw
            s_n = s + alpha * ds
            lam_n = lam + alpha * dlam
            zl_n = zl + a_d * dzl
            zu_n = zu + a_d * dzu
            # keep duals sane relative to the barrier parameter (IPOPT's
            # kappa_Sigma safeguard)
            dl_w, dl_s = dist_l(w_n, s_n)
            du_w = dist_u(w_n)
            dl = jnp.concatenate([dl_w, dl_s])
            kap = 1e10
            zl_n = jnp.clip(zl_n, mu_new / (kap * jnp.maximum(dl, 1e-300)),
                            kap * mu_new / jnp.maximum(dl, 1e-300))
            du = jnp.concatenate([du_w, jnp.full((q,), jnp.inf, w.dtype)])
            zu_n = jnp.where(
                jnp.concatenate([has_ub, jnp.zeros((q,), bool)]),
                jnp.clip(zu_n, mu_new / (kap * jnp.maximum(du, 1e-300)),
                         kap * mu_new / jnp.maximum(du, 1e-300)),
                0.0)

            converged = err_0 <= st.tol
            return IPMState(
                w=jnp.where(converged, w, w_n),
                s=jnp.where(converged, s, s_n),
                lam=jnp.where(converged, lam, lam_n),
                zl=jnp.where(converged, zl, zl_n),
                zu=jnp.where(converged, zu, zu_n),
                mu=jnp.where(converged, mu, mu_new),
                it=stt.it + 1,
                converged=converged,
                kkt_err=err_0)

        return jax.lax.while_loop(cond, body, state)

    def init_state(w0, p, lam0=None, mu0=None):
        dtype = w0.dtype
        # push the initial point into the interior (IPOPT bound_push/frac)
        k1, k2 = st.bound_push, st.bound_frac
        lo = jnp.where(has_lb, lb, -jnp.inf)
        hi = jnp.where(has_ub, ub, jnp.inf)
        rng = jnp.where(has_lb & has_ub, hi - lo, jnp.inf)
        pl = jnp.where(has_lb,
                       jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(lo)),
                                   k2 * rng), 0.0)
        pu = jnp.where(has_ub,
                       jnp.minimum(k1 * jnp.maximum(1.0, jnp.abs(hi)),
                                   k2 * rng), 0.0)
        w = jnp.clip(w0, jnp.where(has_lb, lo + pl, -jnp.inf),
                     jnp.where(has_ub, hi - pu, jnp.inf))
        _, hv = eval_all(w, p)
        s = jnp.maximum(-hv, st.slack_min) if q else jnp.zeros((0,), dtype)
        mu = jnp.asarray(st.mu_init if mu0 is None else mu0, dtype)
        lam = jnp.zeros((m + q,), dtype) if lam0 is None else lam0
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        zl = jnp.concatenate([jnp.where(has_lb, mu / dl_w, 0.0), mu / dl_s])
        zu = jnp.concatenate([jnp.where(has_ub, mu / du_w, 0.0),
                              jnp.zeros((q,), dtype)])
        return IPMState(w=w, s=s, lam=lam, zl=zl, zu=zu, mu=mu,
                        it=jnp.asarray(0), converged=jnp.asarray(False),
                        kkt_err=jnp.asarray(jnp.inf, dtype))

    def solve(w0, p, lam0=None, mu0=None):
        state = init_state(jnp.asarray(w0), p, lam0=lam0, mu0=mu0)
        final = solver_loop(state, p)
        return IPMSolution(
            w=final.w, s=final.s, lam=final.lam, zl=final.zl, zu=final.zu,
            f=f(final.w, p), kkt_err=final.kkt_err, iterations=final.it,
            success=final.converged)

    return solve
