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
    tol_loop: float | None = None   # barrier-loop exit tolerance; when set
                                # looser than ``tol``, the globalized loop
                                # stops here and the active-set Newton
                                # polish (quadratic from ~1e-4) carries
                                # the point to ``tol`` — the B=1 latency
                                # recipe: ~half the barrier iterations at
                                # unchanged final certification (success
                                # is always judged against ``tol``)
    max_iter: int = 200
    mu_init: float = 1e-1
    mu_min_factor: float = 0.1  # barrier floor mu_min = tol * this.  The
                                # central-path point at mu has true KKT
                                # error ~ c*mu with a problem-dependent c;
                                # tol/10 suffices for the CSTR family
                                # (c ~ 1) but DIP N=100 measures c ~ 50,
                                # leaving certification at tol unreachable
                                # from the floor — lower the factor for
                                # such problems (exposed as
                                # solver_mu_min_factor on MPC settings)
    kappa_eps: float = 10.0     # inner loop: E_mu <= kappa_eps * mu
    kappa_mu: float = 0.2       # linear mu decrease factor
    theta_mu: float = 1.5       # superlinear mu decrease power
    tau_min: float = 0.99       # fraction-to-boundary
    bound_push: float = 1e-2    # kappa_1: relative initial push into interior
    bound_frac: float = 1e-2    # kappa_2
    slack_min: float = 1e-8
    z_init: float = 1.0         # initial bound duals (IPOPT initializes z=1)
    ls_max: int = 25            # max halvings in line search
    # -- globalization ----------------------------------------------------
    # 'filter': Wächter-Biegler (theta, phi) filter line search — the
    # IPOPT globalization (reference behavior behind every nlpsol call,
    # do_mpc/optimizer.py:731-787).  Unlike the l1 merit whose penalty
    # nu ~ 2|lam|_inf forbids trading a little feasibility for a big
    # objective drop, the filter accepts any non-dominated (theta, phi)
    # pair — the step-length regime that traverses long nonconvex
    # valleys (DIP N=100 swing-up: merit crawls at alpha~0.02 for 1500+
    # iterations; measured r5).  'merit': the legacy l1-merit tests.
    globalization: str = "filter"
    filter_size: int = 16       # static per-instance filter capacity
                                # (circular overwrite; IPOPT filters stay
                                # small between mu resets)
    gamma_theta: float = 1e-5   # filter margin on theta
    gamma_phi: float = 1e-8     # filter margin on phi
    eta_phi: float = 1e-8       # Armijo relaxation (f-type)
    s_theta: float = 1.1        # switching condition powers
    s_phi: float = 2.3
    delta_switch: float = 1.0   # switching condition scale
    gamma_alpha: float = 0.05   # alpha_min safety fraction
    use_resto: bool = True      # feasibility-restoration regime on
                                # line-search failure.  Static flag: the
                                # restoration's _cond_any adds a while-
                                # loop boundary to the hot loop that
                                # splits XLA fusion clusters (~17 ms/iter
                                # at B=128 even when no element ever
                                # restores — the r3 boundary cost, re-
                                # measured r5 as a 40% flagship hit), so
                                # throughput mode turns it off and keeps
                                # the alpha_min fallback step instead.
    resto_delta: float = 1e6    # proximal weight of the restoration
                                # solve: with delta dominant the KKT
                                # system returns the minimum-norm step
                                # onto the linearized constraints —
                                # feasibility restoration that reuses the
                                # factored structure instead of a second
                                # NLP (IPOPT solves a dedicated resto
                                # NLP; same role)
    delta_reg: float = 1e-8     # base primal regularization
    delta_cons: float = 1e-11   # dual regularization (keeps KKT nonsingular)
    cold_dual_init: bool = False  # least-squares multiplier estimation
                                # for cold solves (one extra backsolve
                                # before the loop; IPOPT's
                                # least_square_init_duals analogue).
                                # MEASURED NET-NEGATIVE on the flagship
                                # (r5): cold iterations 14 -> 18-22
                                # across refit_delta 3e2..1e4 — the
                                # lam-from-zero walk the estimate was
                                # meant to skip also does productive
                                # primal work, and the LS multipliers
                                # mislead the lam-weighted Hessian far
                                # from the optimum.  Kept as a recorded
                                # experiment; delta must stay ~<=1e3 in
                                # f32 (at 1e8 the dual Schur pivot
                                # ||J||^2/delta drowns in eps*delta
                                # elimination noise -> |lam| ~ 1e9).
    lam_init_max: float = 1e4   # reject LS dual estimates larger than
                                # this (fall back to lam=0)
    dual_cap: float = 1e2       # relative trust region on the equality-
                                # multiplier step (filter mode):
                                # |dlam|_inf <= dual_cap * (1+|lam|_inf).
                                # With a large proximal delta and r_g != 0
                                # the KKT solve returns dlam ~
                                # delta*(J J^T)^-1 r_g — regularization-
                                # amplified garbage that nothing in a
                                # primal (theta, phi) acceptance can see;
                                # unbounded it walks lam to 1e10 (r5 DIP
                                # trace).  Geometric growth 100x/iter is
                                # still allowed, so legitimate multiplier
                                # jumps converge in a couple iterations.
    prox_max: float = 1e4       # cap on the adaptive Levenberg damping.
                                # Scaled variables are O(1): once prox
                                # exceeds ~1e2 the "Newton" step is a
                                # short gradient step AND the multiplier
                                # update amplifies as dlam ~ prox *
                                # (J J^T)^-1 r_g — the DIP death spiral
                                # (diagnosed r5): tiny alpha -> prox x10
                                # -> dual explosion -> worse curvature
                                # -> tinier alpha.
    s_max: float = 100.0        # KKT error scaling (IPOPT's s_max)
    debug: bool = False         # jax.debug.print per-iteration diagnostics
    reg_retries: int = 5        # regularization-ladder length
    use_soc: bool = True        # second-order correction step
    do_polish: bool = True      # active-set Newton polish after the loop
    rti_iters: int = 0          # >0: real-time-iteration mode — exactly this
                                # many full Newton steps at fixed mu, no line
                                # search / convergence loop (acados-style
                                # hot path for receding-horizon warm starts)
    rti_prox: float = 1e-3      # fixed Levenberg damping of RTI steps (the
                                # acados `levenberg_marquardt` option):
                                # without a line search, near-flat reduced-
                                # Hessian directions otherwise produce huge
                                # Newton steps that leave the convergence
                                # basin (measured: KKT err 1e2..1e3 on the
                                # robust CSTR after one plant step)
    rti_step_max: float = 10.0  # trust-region cap on the RTI step: alpha is
                                # scaled so |dw|_inf*alpha <= this (scaled
                                # variables are O(1))
    dual_refit: bool = False    # least-squares multiplier refit before
                                # each Newton step: one extra backsolve
                                # with a dominant primal proximal weight
                                # returns dlam ~= -(J J^T)^-1 J r_dw, the
                                # Gauss LS correction applied at FULL step
                                # (never scaled by the primal alpha).
                                # Breaks the DIP crawl cycle where the
                                # Levenberg prox re-injects stationarity
                                # residual ~prox*|dw| every iteration and
                                # the alpha-scaled lam update can never
                                # reach the LS multipliers (r5 diagnosis).
    refit_delta: float = 1e8    # proximal weight of the refit solve
    rti_drift_tol: float | None = None  # bounded-drift RTI: when set,
                                # extra corrective Newton iterations run
                                # after the fixed rti_iters until the
                                # true KKT error is back under this
                                # threshold (or rti_extra_max is spent);
                                # success then certifies against it.
                                # None = pure fixed-cost RTI (no
                                # certification, error may drift).
    rti_extra_max: int = 6      # cap on drift-correction iterations
    rti_filter: bool = False    # filter-RTI hybrid: warm steps run the FULL
                                # globalized filter loop (line search, SOC,
                                # restoration ladder) but capped at rti_iters
                                # iterations instead of raw damped Newton
                                # steps.  This is the deployment mode for
                                # strongly nonlinear plants (DIP swing-up)
                                # where pure RTI's fixed undamped steps
                                # diverge (measured r5: kkt -> 8.8e5) —
                                # each step costs at most rti_iters filter
                                # iterations, and with rti_drift_tol set the
                                # loop exits EARLY whenever the warm state is
                                # already inside the band (adaptive cost,
                                # acados-style certification).
    rti_mu_decay: float = 0.1   # per-RTI-iteration barrier decrease: at the
                                # warm-start mu the central-path bias in
                                # near-degenerate directions is O(mu/
                                # lambda_min) — decaying mu each Newton step
                                # tracks the true KKT point instead
    n_refine_kkt: int = 0       # KKT-level iterative-refinement passes per
                                # Newton step: re-solve the SAME factored
                                # system with the true step residual (the
                                # matrix-free hvp/jvp application of the
                                # full KKT operator) as right-hand side.
                                # This is the mixed-precision recipe that
                                # pushes the f32 band-QR path below its
                                # 1e-4 scaled-KKT noise floor: the
                                # factorization stays f32, the residual is
                                # formed at the AD level where cancellation
                                # is benign (each term is a fresh f32
                                # rounding of an exact product, not the
                                # difference of two large factored values)


def ipm_settings_from(st, **overrides) -> "IPMSettings":
    """Build IPMSettings from an MPC/MHE settings object.

    Mirrors the reference's full solver-option passthrough
    (do_mpc/controller/_controllersettings.py:139-175, nlpsol_opts +
    set_linear_solver): the ``solver_*`` dataclass fields map onto
    IPMSettings, and IPOPT-style keys in ``nlpsol_opts`` (e.g.
    ``{'ipopt.tol': 1e-10, 'ipopt.mu_init': 1e-2}``) are translated so
    reference example code keeps working.
    """
    kw = dict(
        tol=getattr(st, "solver_tol", 1e-8),
        tol_loop=getattr(st, "solver_tol_loop", None),
        max_iter=getattr(st, "solver_max_iter", 200),
        mu_init=getattr(st, "solver_mu_init", 1e-1),
        reg_retries=getattr(st, "solver_reg_retries", 5),
        use_soc=getattr(st, "solver_use_soc", True),
        do_polish=getattr(st, "solver_do_polish", True),
        ls_max=getattr(st, "solver_ls_max", 25),
        mu_min_factor=getattr(st, "solver_mu_min_factor", 0.1),
        rti_iters=getattr(st, "solver_rti_iters", 0),
        rti_prox=getattr(st, "solver_rti_prox", 1e-3),
        rti_step_max=getattr(st, "solver_rti_step_max", 10.0),
        rti_mu_decay=getattr(st, "solver_rti_mu_decay", 0.1),
        rti_drift_tol=getattr(st, "solver_rti_drift_tol", None),
        rti_filter=getattr(st, "solver_rti_filter", False),
        rti_extra_max=getattr(st, "solver_rti_extra_max", 6),
        globalization=getattr(st, "solver_globalization", "filter"),
        n_refine_kkt=getattr(st, "solver_n_refine_kkt", 0),
    )
    ipopt_map = {
        "ipopt.tol": ("tol", float),
        "ipopt.max_iter": ("max_iter", int),
        "ipopt.mu_init": ("mu_init", float),
        "ipopt.max_soc": ("use_soc", lambda v: bool(int(v))),
    }
    # keys whose semantics are intrinsic here (no-op by design):
    # output verbosity, timing prints, linear-solver choice (the structured
    # BBD/condensed factorization replaces MUMPS/MA27), warm-start behavior
    # (always honored when a warm start is passed)
    silent_ok = {"ipopt.print_level", "ipopt.sb", "print_time",
                 "ipopt.linear_solver", "ipopt.warm_start_init_point",
                 "expand", "ipopt.output_file"}
    for key, val in getattr(st, "nlpsol_opts", {}).items():
        if key in ipopt_map:
            name, conv = ipopt_map[key]
            kw[name] = conv(val)
        elif key not in silent_ok:
            import warnings as _warnings
            _warnings.warn(
                f"nlpsol_opts key {key!r} has no equivalent in the "
                "TPU-native IPM solver and is ignored "
                f"(mapped keys: {sorted(ipopt_map)}).", stacklevel=2)
    kw.update(overrides)
    return IPMSettings(**kw)


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
    prox: jnp.ndarray     # adaptive Levenberg damping (trust-region-like)
    # best-iterate watchdog: a non-converged loop exit (max_iter) must
    # return the best point SEEN, not the last one — on hard problems the
    # final iterate can sit orders of magnitude above earlier ones
    # (measured: a DIP warm step wandered to err 59 after having visited
    # 4e-3).  Converged runs are unaffected (the frozen state is the
    # best).  Tracked primal-dual tuple + its true (mu=0) KKT error.
    best: tuple = ()
    best_err: jnp.ndarray = None
    # Wächter-Biegler filter state (globalization='filter'): forbidden
    # (theta, phi) pairs, circular fill count, and the violation
    # envelope computed from the initial point
    filt_th: jnp.ndarray = None
    filt_ph: jnp.ndarray = None
    filt_n: jnp.ndarray = None
    th_max: jnp.ndarray = None
    th_min: jnp.ndarray = None


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


_TINY = 1e-30  # safe positive floor that survives float32


def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def _cond_any(pred, true_fn, false_val):
    """``lax.cond`` that SKIPS the true branch when no batch element
    needs it.

    Under ``vmap``, ``lax.cond`` lowers to ``select`` and executes BOTH
    branches for the whole batch, every time — the second-order
    correction and the regularization-retry rungs each cost a full KKT
    backsolve per iteration that way (the round-2 reason throughput mode
    dropped them entirely).  A 0/1-trip ``while_loop`` instead runs its
    body only while ANY element's predicate holds (jax's while batching
    rule reduces the condition with `any` and select-preserves finished
    elements), so the common all-accepted iteration pays nothing.
    ``true_fn()`` must return a pytree matching ``false_val``."""
    def cond(carry):
        return carry[0]

    def body(carry):
        return (jnp.zeros_like(carry[0]), true_fn())

    _, out = jax.lax.while_loop(cond, body, (pred, false_val))
    return out


def make_ipm_solver(
    f: Callable, g: Callable, h: Callable,
    lb, ub, n_eq: int, n_ineq: int,
    settings: IPMSettings = IPMSettings(),
    kkt_solve: Optional[Callable] = None,
    hess_fn: Optional[Callable] = None,
    grad_f_fn: Optional[Callable] = None,
    jac_g_fn: Optional[Callable] = None,
    jac_h_fn: Optional[Callable] = None,
    structured_solve: Optional[Callable] = None,
    dynamic_bounds: bool = False,
    _bound_masks=None,
):
    """Build a single-instance solver ``solve(w0, p, lam0=None) -> IPMSolution``.

    All of f/g/h take (w, p).  ``lb/ub`` are static numpy arrays (may contain
    +-inf).  vmap the returned function for batched solves.

    ``kkt_solve(Hw, Sig_w, Jg, Jh, inv_sig_s, r_dw, r_g, r_h_mod, delta)``
    may exploit problem structure; the default is a dense LU.

    ``dynamic_bounds=True`` lets callers pass per-solve bound VALUES
    (``solve(..., lb_dyn=, ub_dyn=)``, traced/batchable) while the bound
    sparsity pattern (which entries are bounded at all) stays that of the
    static ``lb/ub`` — exactly what branch-and-bound node solves need,
    where only finite integer-variable bounds are tightened per node.
    """
    st = settings
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    n = lb.shape[0]
    m, q = n_eq, n_ineq

    if _bound_masks is not None:
        # per-solve bound VALUES may be traced; the sparsity pattern
        # (which entries are bounded at all) is pinned by the caller
        has_lb, has_ub = _bound_masks
    else:
        has_lb = jnp.isfinite(lb)
        has_ub = jnp.isfinite(ub)
    lb_static, ub_static = lb, ub

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

    # Jacobian-vector products (used instead of materialized Jacobians
    # wherever possible — and exclusively in structured mode)
    def jgT_mv(w, p, lam):
        if not m:
            return jnp.zeros_like(w)
        return jax.vjp(lambda ww: g(ww, p), w)[1](lam)[0]

    def jhT_mv(w, p, nu):
        if not q:
            return jnp.zeros_like(w)
        return jax.vjp(lambda ww: h(ww, p), w)[1](nu)[0]

    def jg_mv(w, p, dx):
        if not m:
            return jnp.zeros((0,), w.dtype)
        return jax.jvp(lambda ww: g(ww, p), (w,), (dx,))[1]

    def jh_mv(w, p, dx):
        if not q:
            return jnp.zeros((0,), w.dtype)
        return jax.jvp(lambda ww: h(ww, p), (w,), (dx,))[1]

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
    def point_evals(w, lam, p):
        """The (gradient, residuals, constraint-Jacobian-transpose
        product) shared by the KKT-error check and the Newton step at the
        same point — computed once and passed explicitly wherever the
        two uses sit on opposite sides of a while_loop boundary (XLA
        cannot CSE across it)."""
        gf = grad_f(w, p)
        gv, hv = eval_all(w, p)
        jtl = jgT_mv(w, p, lam[:m]) + jhT_mv(w, p, lam[m:])
        return (gf, gv, hv, jtl)

    def kkt_residuals(w, s, lam, zl, zu, p, pre=None):
        """Mu-independent residual summary; errors for any mu derive from it
        cheaply (one evaluation serves err_mu / err_0 / err_{mu_new})."""
        gf, gv, hv, jtl = pre if pre is not None else point_evals(
            w, lam, p)
        r_dw = gf + jtl
        r_dw = r_dw - jnp.where(has_lb, zl[:n], 0.0) \
                    + jnp.where(has_ub, zu[:n], 0.0)
        r_ds = (lam[m:] - zl[n:]) if q else jnp.zeros((0,), w.dtype)
        r_p = jnp.concatenate([gv, hv + s])
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        comp_l = jnp.concatenate([
            jnp.where(has_lb, dl_w * zl[:n], 0.0), dl_s * zl[n:]])
        mask_l = jnp.concatenate([has_lb, jnp.ones((q,), bool)])
        comp_u = jnp.where(has_ub, du_w * zu[:n], 0.0)
        z_sum = jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))
        lam_sum = jnp.sum(jnp.abs(lam))
        denom = n + q + m
        s_d = jnp.maximum(st.s_max, (lam_sum + z_sum)
                          / jnp.maximum(denom, 1)) / st.s_max
        s_c = jnp.maximum(st.s_max,
                          z_sum / jnp.maximum(n + q, 1)) / st.s_max
        r_d_all = jnp.concatenate([r_dw, r_ds])
        err_d = jnp.max(jnp.abs(r_d_all)) / s_d
        err_p = jnp.max(jnp.abs(r_p)) if (m + q) else jnp.asarray(0.0)
        if st.debug:
            jax.debug.print(
                "   kkt: err_d={ed:.2e}@{ia} (n={n}) err_p={ep:.2e}@{ip}",
                ed=err_d, ia=jnp.argmax(jnp.abs(r_d_all)), n=n,
                ep=err_p, ip=(jnp.argmax(jnp.abs(r_p)) if (m + q)
                              else 0))
        return (err_d, err_p, comp_l, mask_l, comp_u, s_c)

    def err_from(res, mu):
        err_d, err_p, comp_l, mask_l, comp_u, s_c = res
        c_l = jnp.where(mask_l, comp_l - mu, 0.0)
        c_u = jnp.where(has_ub, comp_u - mu, 0.0)
        err_c = jnp.maximum(jnp.max(jnp.abs(c_l), initial=0.0),
                            jnp.max(jnp.abs(c_u), initial=0.0)) / s_c
        return jnp.maximum(jnp.maximum(err_d, err_p), err_c)

    def kkt_error(w, s, lam, zl, zu, p, mu):
        return err_from(kkt_residuals(w, s, lam, zl, zu, p), mu)

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
    def newton_step(w, s, lam, zl, zu, p, mu, prox, pre=None):
        lam_g, lam_h = lam[:m], lam[m:]
        gf, gv, hv, jtl = pre if pre is not None else point_evals(
            w, lam, p)

        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        dl_w = jnp.maximum(dl_w, _TINY)
        du_w = jnp.maximum(du_w, _TINY)
        dl_s = jnp.maximum(dl_s, _TINY)

        sig_w = jnp.where(has_lb, zl[:n] / dl_w, 0.0) \
              + jnp.where(has_ub, zu[:n] / du_w, 0.0)
        sig_s = zl[n:] / dl_s

        # barrier-gradient form of the dual residual
        r_dw = gf + jtl \
            - jnp.where(has_lb, mu / dl_w, 0.0) \
            + jnp.where(has_ub, mu / du_w, 0.0)
        r_ds = lam_h - mu / dl_s if q else jnp.zeros((0,), w.dtype)
        r_g = gv
        r_h = hv + s

        inv_sig_s = 1.0 / jnp.maximum(sig_s, _TINY) if q \
            else jnp.zeros((0,), w.dtype)
        r_h_mod = r_h - r_ds * inv_sig_s

        if structured_solve is not None:
            if isinstance(structured_solve, tuple):
                # (prepare, solve): derivatives + scatter assembly run once
                # per Newton step; the retry ladder and the second-order
                # correction reuse the assembled system (under vmap every
                # lax.cond branch executes, so per-call assembly would be
                # paid unconditionally)
                s_prepare, s_solve = structured_solve
                kkt_ctx = s_prepare(w, p, lam_g, lam_h, sig_w, inv_sig_s)

                def do_solve_rhs(r_dw_, r_g_, r_h_mod_, delta):
                    return s_solve(kkt_ctx, r_dw_, r_g_, r_h_mod_,
                                   jnp.asarray(delta, w.dtype))
            else:
                def do_solve_rhs(r_dw_, r_g_, r_h_mod_, delta):
                    return structured_solve(w, p, lam_g, lam_h, sig_w,
                                            inv_sig_s, r_dw_, r_g_,
                                            r_h_mod_,
                                            jnp.asarray(delta, w.dtype))

            def hvp(dx, _lg=lam_g, _lh=lam_h):
                # Lagrangian Hessian-vector product via jvp of the
                # gradient.  Default-arg snapshot of the multipliers:
                # the dual refit below rebinds lam_g/lam_h, but the
                # assembled ctx holds the OLD-lambda Hessian — the
                # operator used in residual/curvature checks must match
                # the factored matrix, not the refit multipliers.
                def lag_grad(ww):
                    return (grad_f(ww, p) + jgT_mv(ww, p, _lg)
                            + jhT_mv(ww, p, _lh))
                return jax.jvp(lag_grad, (w,), (dx,))[1]
        else:
            Jg = jac_g(w, p) if m else jnp.zeros((0, n), w.dtype)
            Jh = jac_h(w, p) if q else jnp.zeros((0, n), w.dtype)
            Hw = hess_fn(w, p, lam_g, lam_h)

            def do_solve_rhs(r_dw_, r_g_, r_h_mod_, delta):
                return solve_kkt(Hw, sig_w, Jg, Jh, inv_sig_s, r_dw_, r_g_,
                                 r_h_mod_, jnp.asarray(delta, w.dtype))

            def hvp(dx):
                return Hw @ dx

        # -- least-squares multiplier refit (dual_refit) ---------------
        # One backsolve with a dominant primal proximal weight: the
        # (w,lam) block degenerates to  refit_delta*dw + J^T dlam =
        # -r_dw,  J dw ~= 0  =>  dlam ~= -(J J^T)^-1 J r_dw — the
        # (barrier-weighted) least-squares multiplier correction.  It is
        # applied at FULL step before the Newton direction is computed,
        # so the alpha-scaled update can no longer starve the duals: on
        # degenerate problems (DIP N=100) the Levenberg prox re-injects
        # stationarity residual ~prox*|dw| every iteration, and with
        # lam stepped by the primal alpha the multipliers never reach
        # their LS values — the measured r5 crawl cycle.  The slack
        # rows get -r_ds*inv_sig_s so lam_h is simultaneously pulled
        # toward the centered value mu/dist.
        dlam_pre = jnp.zeros((m + q,), w.dtype)
        if st.dual_refit and (m + q):
            _, dgr, dhr = do_solve_rhs(
                r_dw, jnp.zeros((m,), w.dtype),
                (-r_ds * inv_sig_s) if q else jnp.zeros((0,), w.dtype),
                st.refit_delta)
            ok_r = jnp.all(jnp.isfinite(dgr)) & jnp.all(jnp.isfinite(dhr))
            dgr = jnp.where(ok_r, dgr, 0.0)
            dhr = jnp.where(ok_r, dhr, 0.0)
            dlam_pre = jnp.concatenate([dgr, dhr])
            lam_g = lam_g + dgr
            lam_h = lam_h + dhr
            jtl_r = jgT_mv(w, p, lam_g) + jhT_mv(w, p, lam_h)
            r_dw = gf + jtl_r \
                - jnp.where(has_lb, mu / dl_w, 0.0) \
                + jnp.where(has_ub, mu / du_w, 0.0)
            r_ds = lam_h - mu / dl_s if q else jnp.zeros((0,), w.dtype)
            r_h_mod = r_h - r_ds * inv_sig_s

        def do_solve(delta):
            return do_solve_rhs(r_dw, r_g, r_h_mod, delta)

        # Retry with escalating primal regularization when the step is bad:
        # non-finite, wrong curvature, or (critical for the unpivoted
        # block-tridiagonal path) an inaccurate linear solve.  Regularizing
        # pushes H+Sigma+delta toward PD, where block elimination is stable.
        rhs_norm = jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(r_dw), initial=0.0),
            jnp.max(jnp.abs(r_g), initial=0.0)),
            jnp.max(jnp.abs(r_h_mod), initial=0.0)) + 1e-12

        def step_residual(step, delta):
            dw_, dg_, dh_ = step
            res_w = (hvp(dw_) + (sig_w + delta) * dw_ + r_dw
                     + jgT_mv(w, p, dg_) + jhT_mv(w, p, dh_))
            out = jnp.max(jnp.abs(res_w), initial=0.0)
            if m:
                res_g = jg_mv(w, p, dw_) - st.delta_cons * dg_ + r_g
                out = jnp.maximum(out, jnp.max(jnp.abs(res_g), initial=0.0))
            if q:
                res_h = jh_mv(w, p, dw_) - inv_sig_s * dh_ \
                    - st.delta_cons * dh_ + r_h_mod
                out = jnp.maximum(out, jnp.max(jnp.abs(res_h), initial=0.0))
            return out

        def need_retry(step, delta):
            dw_, dg_, dh_ = step
            bad = ~jnp.all(jnp.isfinite(dw_)) | ~jnp.all(jnp.isfinite(dg_)) \
                | ~jnp.all(jnp.isfinite(dh_))
            curv = jnp.dot(dw_, hvp(dw_)) \
                + jnp.sum((sig_w + delta) * dw_ * dw_)
            wrong_curv = curv < -1e-10 * (1.0 + jnp.dot(dw_, dw_))
            # inexact-Newton acceptance: a modest relative residual still
            # yields a productive IP step (forcing-term theory)
            inaccurate = step_residual(step, delta) > 1e-2 * rhs_norm
            return bad | wrong_curv | inaccurate

        step = do_solve(prox)
        prev_delta = prox
        for mult in (10.0, 1e2, 1e3, 1e5, 1e7)[:st.reg_retries]:
            bad = need_retry(step, prev_delta)
            # rung deltas are capped: above prox_max the damped system's
            # multiplier response dlam ~ delta*(J J^T)^-1 r_g is pure
            # regularization garbage (and the primal step pure noise)
            delta = jnp.minimum(jnp.maximum(prox, 1e-8) * mult,
                                st.prox_max)
            # zero-trip skip when no element needs this rung (a lax.cond
            # would re-run the full KKT solve unconditionally under vmap
            # — the round-2 profile measured the ladder at 2x
            # per-iteration cost, which is why throughput mode dropped it)
            step = _cond_any(bad, lambda d=delta: do_solve(d), step)
            prev_delta = jnp.where(bad, delta, prev_delta)
        # KKT-level iterative refinement: one extra backsolve with the
        # true residual of the computed step halves the effective solve
        # error floor (f32 factor + exact-operator residual).  The
        # residual terms reuse the matrix-free operator application.
        for _ in range(st.n_refine_kkt):
            dw_r, dg_r, dh_r = step
            res_w = (hvp(dw_r) + (sig_w + prev_delta) * dw_r + r_dw
                     + jgT_mv(w, p, dg_r) + jhT_mv(w, p, dh_r))
            res_g = (jg_mv(w, p, dw_r) - st.delta_cons * dg_r + r_g) \
                if m else r_g
            res_h = (jh_mv(w, p, dw_r) - inv_sig_s * dh_r
                     - st.delta_cons * dh_r + r_h_mod) \
                if q else r_h_mod
            corr = do_solve_rhs(res_w, res_g, res_h, prev_delta)
            ok_c = (jnp.all(jnp.isfinite(corr[0]))
                    & jnp.all(jnp.isfinite(corr[1]))
                    & jnp.all(jnp.isfinite(corr[2])))
            step = tuple(jnp.where(ok_c, a + c, a)
                         for a, c in zip(step, corr))

        dw, dlam_g, dlam_h = step
        # Non-finite guard (load-bearing when reg_retries == 0, i.e.
        # throughput mode, where no retry rung would catch a failed
        # factorization): zero the step and escalate the Levenberg prox so
        # the next iteration solves a better-regularized system.  A zero
        # step is always "accepted" by the line search, so without this a
        # single NaN would poison the whole solve under vmap.
        step_ok = (jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dlam_g))
                   & jnp.all(jnp.isfinite(dlam_h)))
        dw = jnp.where(step_ok, dw, 0.0)
        dlam_g = jnp.where(step_ok, dlam_g, 0.0)
        dlam_h = jnp.where(step_ok, dlam_h, 0.0)
        prev_delta = jnp.where(step_ok, prev_delta,
                               jnp.maximum(prox, 1e-8) * 100.0)
        if st.debug:
            jax.debug.print(
                "  newton: |dw|={dwn:.2e}@{i} delta={d:.1e} res={r:.2e}",
                dwn=jnp.max(jnp.abs(dw)), i=jnp.argmax(jnp.abs(dw)),
                d=prev_delta, r=step_residual(step, prev_delta))

        def recover(dw_, dlam_g_, dlam_h_, r_h_used):
            ds_ = -(r_h_used + jh_mv(w, p, dw_)) if q \
                else jnp.zeros((0,), w.dtype)
            dlam_ = jnp.concatenate([dlam_g_, dlam_h_])
            dzl_w = jnp.where(has_lb, _safe_div(mu - zl[:n] * dl_w, dl_w)
                              - _safe_div(zl[:n] * dw_, dl_w), 0.0)
            dzl_s = _safe_div(mu - zl[n:] * dl_s, dl_s) \
                - _safe_div(zl[n:] * ds_, dl_s) if q \
                else jnp.zeros((0,), w.dtype)
            dzu_w = jnp.where(has_ub, _safe_div(mu - zu[:n] * du_w, du_w)
                              + _safe_div(zu[:n] * dw_, du_w), 0.0)
            dzl_ = jnp.concatenate([dzl_w, dzl_s])
            dzu_ = jnp.concatenate([dzu_w, jnp.zeros((q,), w.dtype)])
            return dw_, ds_, dlam_, dzl_, dzu_

        def resolve_soc(alpha):
            """Second-order correction (IPOPT-style): re-solve with the
            constraint value at the trial point to absorb the curvature-
            induced infeasibility of a long step."""
            w_t = w + alpha * dw
            gv_t = g(w_t, p) if m else jnp.zeros((0,), w.dtype)
            hv_t = h(w_t, p) if q else jnp.zeros((0,), w.dtype)
            r_g_soc = alpha * r_g + gv_t
            r_h_soc = alpha * r_h + hv_t + (s + alpha * (-(r_h + jh_mv(
                w, p, dw)) if q else jnp.zeros((0,), w.dtype)))
            r_h_mod_soc = r_h_soc - r_ds * inv_sig_s if q \
                else jnp.zeros((0,), w.dtype)
            dw2, dg2, dh2 = do_solve_rhs(r_dw, r_g_soc, r_h_mod_soc,
                                         prev_delta)
            return recover(dw2, dg2, dh2, r_h_soc)

        def resolve_resto():
            """Feasibility-restoration direction: with the proximal
            weight dominant the KKT system returns the minimum-norm
            (barrier-metric-weighted) step onto the linearized
            constraints — theta decreases to second order while the
            primal point moves minimally.  The multiplier/bound-dual
            components are discarded by the caller except the centering
            parts recover() produces."""
            dwr, dgr2, dhr2 = do_solve_rhs(
                jnp.zeros_like(r_dw), r_g, r_h, st.resto_delta)
            return recover(dwr, dgr2, dhr2, r_h)

        return recover(dw, dlam_g, dlam_h, r_h) + (resolve_soc, prev_delta,
                                                   dlam_pre, resolve_resto)

    # -- fraction to boundary ----------------------------------------------
    def max_alpha(x, dx, dist, active):
        # largest alpha in (0,1] with x + alpha dx >= x - tau*dist
        tau_dist = dist
        ratio = jnp.where(active & (dx < 0), -tau_dist / jnp.where(
            dx == 0, -1.0, dx), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, initial=jnp.inf))

    def dual_alpha(zl, zu, dzl, dzu, mu):
        tau = jnp.maximum(st.tau_min, 1.0 - mu)
        mask_zl = jnp.concatenate([has_lb, jnp.ones((q,), bool)])
        a_d = max_alpha(zl, dzl, tau * zl, mask_zl)
        mask_zu = jnp.concatenate([has_ub, jnp.zeros((q,), bool)])
        return jnp.minimum(a_d, max_alpha(zu, dzu, tau * zu, mask_zu))

    def fraction_to_boundary(w, s, dw, ds, zl, zu, dzl, dzu, mu):
        tau = jnp.maximum(st.tau_min, 1.0 - mu)
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        a_p = max_alpha(w, dw, tau * dl_w, has_lb)
        a_p = jnp.minimum(a_p, max_alpha(w, -dw, tau * du_w, has_ub))
        if q:
            a_p = jnp.minimum(a_p, max_alpha(s, ds, tau * dl_s,
                                             jnp.ones_like(s, bool)))
        return a_p, dual_alpha(zl, zu, dzl, dzu, mu)

    # -- line search on l1 merit -------------------------------------------
    def ls_trial(w, s, dw, ds, p, mu, alpha, nu, gvhv0=None):
        """Single acceptance test at the given step size.  ``gvhv0``:
        optional precomputed (g, h) at ``w`` (see point_evals).

        KNOWN LIMITATION (diagnosed r4, kept as-is by measurement): near
        feasibility (vio0 ~ 0) every clause degenerates to "merit did not
        increase (mod float noise)", and on degenerate problems the
        barrier merit is flat along near-singular directions — DIP N=100
        cycles permanently between err 5e-3 and 1e-1 at the barrier
        floor (SOC steps with tiny fraction-to-boundary alpha pass the
        merit test while wrecking the dual residual).  Both attempted
        fixes measured WORSE elsewhere and were reverted: (a) a KKT-blow-
        up veto on acceptance broke the DIP warm sequence differently
        (err 15 after 60 iters) while adding a KKT evaluation per line-
        search trip; (b) scaling the dual-response part of the step by
        the primal alpha degraded RTI closed-loop quality (F err 0.094 >
        0.06 gate) and diverged DIP warm starts.  The real cure is an
        IPOPT-style filter + feasibility restoration, noted as future
        work; every other reference benchmark converges as-is."""
        phi0 = barrier_value(w, s, p, mu)
        gv, hv = gvhv0 if gvhv0 is not None else eval_all(w, p)
        vio0 = constraint_violation(gv, hv, s)
        w_t = w + alpha * dw
        s_t = s + alpha * ds
        phi = barrier_value(w_t, s_t, p, mu)
        gv_t, hv_t = eval_all(w_t, p)
        vio = constraint_violation(gv_t, hv_t, s_t)
        merit0 = phi0 + nu * vio0
        merit = phi + nu * vio
        return jnp.isfinite(merit) & (
            (merit <= merit0 - 1e-8 * alpha * jnp.maximum(vio0, 1e-16))
            | (vio <= vio0 * (1 - 1e-4 * alpha))
            | (merit <= merit0 + 1e-12 * jnp.abs(merit0))
        )

    def line_search(w, s, dw, ds, p, mu, alpha_max, nu, pre_ok=None,
                gvhv0=None):
        """Backtracking on the l1 merit.  ``pre_ok`` seeds the loop with
        the already-decided acceptance of the FULL step ``alpha_max`` (the
        ``ls_trial``/KKT-decrease test computed outside): seeded-done
        elements take zero loop trips, and — critically under ``vmap``,
        where a batched ``while_loop`` runs while ANY element is
        unfinished — a fully-accepted warm batch skips the body entirely
        instead of paying one dead f/g/h trial evaluation per Newton
        step (measured ~5 ms/iter at B=128 on the flagship)."""
        phi0 = barrier_value(w, s, p, mu)
        gv, hv = gvhv0 if gvhv0 is not None else eval_all(w, p)
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
            alpha, k, done = carry
            # halve first: the seed already covers the alpha_max trial.
            # Under vmap the batched while_loop keeps applying the body
            # until EVERY element is done, so finished elements must be
            # preserved explicitly.
            alpha_try = alpha * 0.5
            ok = try_alpha(alpha_try)
            return (jnp.where(done, alpha, alpha_try), k + 1, done | ok)

        def cond(carry):
            alpha, k, done = carry
            return (~done) & (k < st.ls_max)

        if pre_ok is None:
            pre_ok = try_alpha(alpha_max)
        alpha, _, done = jax.lax.while_loop(
            cond, body, (alpha_max, 0, pre_ok))
        # if the search failed entirely take a tiny step (keeps progress
        # under vmap; IPOPT would enter feasibility restoration here)
        alpha = jnp.where(done, alpha, alpha_max * (0.5 ** st.ls_max))
        return alpha

    # -- main loop ----------------------------------------------------------
    loop_tol = st.tol if st.tol_loop is None else max(st.tol_loop, st.tol)

    def solver_loop(state: IPMState, p, it_cap=None, exit_tol=None):
        # it_cap/exit_tol parametrize the filter-RTI hybrid: the same
        # globalized body with a small fixed iteration budget and a
        # drift-band exit tolerance (both static Python values, baked
        # into the trace).  Defaults reproduce the full solver loop.
        cap = st.max_iter if it_cap is None else it_cap
        etol = loop_tol if exit_tol is None else exit_tol

        def cond(stt: IPMState):
            return (~stt.converged) & (stt.it < cap)

        def body(stt: IPMState):
            w, s, lam, zl, zu, mu = stt.w, stt.s, stt.lam, stt.zl, stt.zu, stt.mu
            # shared point evaluations for the residual check and the
            # Newton step (explicit sharing; XLA would CSE these anyway
            # within one body, but the explicit form keeps that true if
            # pieces ever move across control-flow boundaries)
            pre = point_evals(w, lam, p)
            res0 = kkt_residuals(w, s, lam, zl, zu, p, pre=pre)
            err_mu = err_from(res0, mu)
            err_0 = err_from(res0, 0.0)
            converged = err_0 <= etol

            # NOTE: wrapping everything below in a _cond_any "skip when
            # the whole batch is converged" was built and measured: the
            # while-boundary cost XLA ~17 ms/trip of lost fusion at
            # B=128 — a wash against the skipped trips.  Keep the body
            # straight-line; converged elements are frozen by the
            # jnp.where at the bottom.
            def take_step():
                # barrier update when the inner problem is solved
                shrink = err_mu <= st.kappa_eps * mu
                mu_new = jnp.where(
                    shrink,
                    jnp.maximum(st.tol * st.mu_min_factor,
                                jnp.minimum(st.kappa_mu * mu,
                                            mu ** st.theta_mu)),
                    mu)

                # filter reset on barrier decrease (W-B reinitialize):
                # entries recorded at the old mu constrain a different
                # barrier objective
                mu_dec = mu_new < mu
                filt_th0 = jnp.where(mu_dec, jnp.inf, stt.filt_th)
                filt_ph0 = jnp.where(mu_dec, jnp.inf, stt.filt_ph)
                filt_n0 = jnp.where(mu_dec, 0, stt.filt_n)

                (dw, ds, dlam, dzl, dzu, resolve_soc, delta_used,
                 dlam_pre, resolve_resto) = newton_step(
                     w, s, lam, zl, zu, p, mu_new, stt.prox, pre=pre)
                # the LS multiplier refit is part of the point, not of
                # the searched direction: applied at full step so the
                # primal alpha cannot scale it away
                lam_b = lam + dlam_pre
                if st.globalization == "filter":
                    # dual trust region (see dual_cap): primal acceptance
                    # cannot see multiplier explosions, so bound them here
                    dl_norm = jnp.max(jnp.abs(dlam), initial=0.0)
                    l_norm = jnp.max(jnp.abs(lam_b), initial=0.0)
                    dlam = dlam * jnp.minimum(
                        1.0, st.dual_cap * (1.0 + l_norm)
                        / jnp.maximum(dl_norm, _TINY))
                a_p, a_d = fraction_to_boundary(w, s, dw, ds, zl, zu, dzl,
                                                dzu, mu_new)
                nu = jnp.maximum(1.0, 2.0 * jnp.max(
                    jnp.abs(lam_b + dlam), initial=0.0))

                # acceptance: merit test OR direct KKT-error decrease (the
                # latter is what matters near the central path, where the
                # l1 merit is too conservative once primal feasibility ~ 0)
                err_ref = err_from(res0, mu_new)

                def kkt_decrease(alpha, dw_, ds_, dlam_, dzl_, dzu_, a_d_):
                    w_t = w + alpha * dw_
                    s_t = s + alpha * ds_
                    lam_t = lam_b + alpha * dlam_
                    zl_t = zl + a_d_ * dzl_
                    zu_t = zu + a_d_ * dzu_
                    err_t = kkt_error(w_t, s_t, lam_t, zl_t, zu_t, p,
                                      mu_new)
                    return jnp.isfinite(err_t) & (err_t < 0.99 * err_ref)

                filter_mode = st.globalization == "filter"
                theta_k = constraint_violation(pre[1], pre[2], s)
                phi_k = barrier_value(w, s, p, mu_new)
                ls_failed = jnp.asarray(False)
                f_type = jnp.asarray(True)

                def gphi_dot(dw_, ds_):
                    """Directional derivative of the barrier objective
                    (no constraint terms — those belong to theta)."""
                    dlw_, dls_ = dist_l(w, s)
                    duw_ = dist_u(w)
                    gphi_w = pre[0] \
                        - jnp.where(has_lb,
                                    mu_new / jnp.maximum(dlw_, _TINY), 0.0) \
                        + jnp.where(has_ub,
                                    mu_new / jnp.maximum(duw_, _TINY), 0.0)
                    out = jnp.dot(gphi_w, dw_)
                    if q:
                        out = out + jnp.dot(-mu_new / jnp.maximum(
                            dls_, _TINY), ds_)
                    return out

                def accept_fn(alpha, dw_, ds_, gphi_d_):
                    """W-B acceptance: must be acceptable to the filter
                    AND either (f-type: switching holds -> Armijo on phi)
                    or (h-type: sufficient decrease in theta or phi vs
                    the current point).  Returns (ok, f_type)."""
                    w_t = w + alpha * dw_
                    s_t = s + alpha * ds_
                    phi_t = barrier_value(w_t, s_t, p, mu_new)
                    gv_t, hv_t = eval_all(w_t, p)
                    th_t = constraint_violation(gv_t, hv_t, s_t)
                    fil_ok = jnp.all(
                        (th_t <= (1.0 - st.gamma_theta) * filt_th0)
                        | (phi_t <= filt_ph0 - st.gamma_phi * filt_th0))
                    sw = (gphi_d_ < 0) & (theta_k <= stt.th_min) & (
                        alpha * (-gphi_d_) ** st.s_phi
                        > st.delta_switch * theta_k ** st.s_theta)
                    armijo = phi_t <= phi_k + st.eta_phi * alpha * gphi_d_
                    h_ok = (th_t <= (1.0 - st.gamma_theta) * theta_k) \
                        | (phi_t <= phi_k - st.gamma_phi * theta_k)
                    ok = jnp.isfinite(phi_t) & jnp.isfinite(th_t) \
                        & (th_t <= stt.th_max) & fil_ok \
                        & jnp.where(sw, armijo, h_ok)
                    return ok, sw & armijo

                # full step if acceptable; else one second-order
                # correction (absorbs the nonlinear constraint-violation
                # growth of long steps, IPOPT-style); else backtracking
                # line search
                if filter_mode:
                    gphi_d0 = gphi_dot(dw, ds)
                    acc0, ft0 = accept_fn(a_p, dw, ds, gphi_d0)
                    # KKT-error decrease stays an OR-acceptance (load-
                    # bearing near the central path); counts as f-type
                    # so it never augments the filter (it cannot cycle:
                    # the error strictly contracts)
                    kd0 = kkt_decrease(a_p, dw, ds, dlam, dzl, dzu, a_d)
                    ok_full = acc0 | kd0
                    f_type = ft0 | kd0
                else:
                    ok_full = ls_trial(w, s, dw, ds, p, mu_new, a_p, nu,
                                       gvhv0=pre[1:3]) \
                        | kkt_decrease(a_p, dw, ds, dlam, dzl, dzu, a_d)

                def do_soc(_):
                    dw2, ds2, dlam2, dzl2, dzu2 = resolve_soc(a_p)
                    a_p2, a_d2 = fraction_to_boundary(
                        w, s, dw2, ds2, zl, zu, dzl2, dzu2, mu_new)
                    kd2 = kkt_decrease(a_p2, dw2, ds2, dlam2, dzl2, dzu2,
                                       a_d2)
                    if filter_mode:
                        acc2, ft2 = accept_fn(a_p2, dw2, ds2,
                                              gphi_dot(dw2, ds2))
                        ok2 = acc2 | kd2
                        ft2 = ft2 | kd2
                    else:
                        ok2 = ls_trial(w, s, dw2, ds2, p, mu_new, a_p2,
                                       nu, gvhv0=pre[1:3]) | kd2
                        ft2 = jnp.asarray(True)
                    return ok2, ft2, dw2, ds2, dlam2, dzl2, dzu2, a_p2, \
                        a_d2

                def no_soc(_):
                    return (jnp.asarray(False), jnp.asarray(True), dw, ds,
                            dlam, dzl, dzu, a_p, a_d)

                if st.use_soc:
                    # zero-trip skip when the whole batch accepted the
                    # full step (a lax.cond here would pay the SOC's
                    # extra KKT backsolve unconditionally under vmap)
                    (soc_ok, soc_ft, dw2, ds2, dlam2, dzl2, dzu2, a_p2,
                     a_d2) = _cond_any(~ok_full, lambda: do_soc(None),
                                       no_soc(None))
                else:
                    (soc_ok, soc_ft, dw2, ds2, dlam2, dzl2, dzu2, a_p2,
                     a_d2) = no_soc(None)
                use_soc = (~ok_full) & soc_ok

                def pick(a, b):
                    return jnp.where(use_soc, b, a)

                dw = pick(dw, dw2)
                ds = pick(ds, ds2)
                dlam = pick(dlam, dlam2)
                dzl = pick(dzl, dzl2)
                dzu = pick(dzu, dzu2)
                a_p = jnp.where(use_soc, a_p2, a_p)
                a_d = jnp.where(use_soc, a_d2, a_d)
                f_type = jnp.where(use_soc, soc_ft, f_type)

                # seeded: accepted elements take zero loop trips, so a
                # fully-accepted batch skips the body entirely under vmap
                # (the previous lax.cond formulation executed the dead
                # line-search branch unconditionally under vmap —
                # measured 13.6 ms/iter of waste on the warm flagship at
                # B=128)
                if filter_mode:
                    gphi_d = gphi_dot(dw, ds)
                    gneg = -jnp.minimum(gphi_d, 0.0)
                    amin2 = jnp.where(
                        gneg > 0,
                        st.gamma_phi * theta_k / jnp.maximum(gneg, _TINY),
                        st.gamma_theta)
                    amin3 = jnp.where(
                        (gneg > 0) & (theta_k <= stt.th_min),
                        st.delta_switch * theta_k ** st.s_theta
                        / jnp.maximum(gneg ** st.s_phi, _TINY),
                        jnp.inf)
                    alpha_min = st.gamma_alpha * jnp.minimum(
                        jnp.minimum(st.gamma_theta, amin2), amin3)

                    def ls_body(carry):
                        al, k, done, ft = carry
                        a_try = al * 0.5
                        ok_t, ft_t = accept_fn(a_try, dw, ds, gphi_d)
                        return (jnp.where(done, al, a_try), k + 1,
                                done | ok_t, jnp.where(done, ft, ft_t))

                    def ls_cond(carry):
                        al, k, done, ft = carry
                        return (~done) & (k < st.ls_max) \
                            & (al * 0.5 >= alpha_min)

                    alpha, _, ls_done, f_type = jax.lax.while_loop(
                        ls_cond, ls_body,
                        (a_p, 0, ok_full | use_soc, f_type))
                    ls_failed = ~ls_done
                    alpha = jnp.where(ls_failed, 0.0, alpha)
                else:
                    alpha = line_search(w, s, dw, ds, p, mu_new, a_p, nu,
                                        pre_ok=ok_full | use_soc,
                                        gvhv0=pre[1:3])

                # -- feasibility restoration (filter mode) -------------
                # A failed line search means no step trades theta/phi
                # acceptably; take a minimum-norm step onto the
                # linearized constraints instead (backtracked on theta
                # alone).  Elements stay in this regime on subsequent
                # iterations until theta re-enters filter-acceptable
                # territory.  Infeasibility below resto_trigger cannot
                # be restored (the point is already feasible — W-B's
                # "restoration converged to an unacceptable feasible
                # point" failure); those take the alpha_min fallback
                # step so the loop keeps moving.
                resto_trigger = 1e-12
                use_resto = ls_failed & (theta_k > resto_trigger) \
                    if st.use_resto else jnp.asarray(False)
                if filter_mode and st.use_resto:
                    def do_resto():
                        dwr, dsr, dlamr, dzlr, dzur = resolve_resto()
                        fin = jnp.all(jnp.isfinite(dwr)) \
                            & jnp.all(jnp.isfinite(dsr)) \
                            & jnp.all(jnp.isfinite(dzlr)) \
                            & jnp.all(jnp.isfinite(dzur))
                        dwr = jnp.where(fin, dwr, 0.0)
                        dsr = jnp.where(fin, dsr, 0.0)
                        dzlr = jnp.where(fin, dzlr, 0.0)
                        dzur = jnp.where(fin, dzur, 0.0)
                        a_pr, a_dr = fraction_to_boundary(
                            w, s, dwr, dsr, zl, zu, dzlr, dzur, mu_new)

                        def r_body(carry):
                            al, k, done = carry
                            w_t = w + al * dwr
                            s_t = s + al * dsr
                            gv_t, hv_t = eval_all(w_t, p)
                            th_t = constraint_violation(gv_t, hv_t, s_t)
                            ok_t = jnp.isfinite(th_t) & (
                                th_t <= (1.0 - 1e-4 * al) * theta_k)
                            return (jnp.where(ok_t, al, al * 0.5),
                                    k + 1, done | ok_t)

                        al_r, _, r_ok = jax.lax.while_loop(
                            lambda c: (~c[2]) & (c[1] < 12),
                            r_body, (a_pr, 0, ~use_resto))
                        return dwr, dsr, dzlr, dzur, al_r, a_dr, r_ok

                    zero_r = (jnp.zeros_like(dw), jnp.zeros_like(ds),
                              jnp.zeros_like(dzl), jnp.zeros_like(dzu),
                              jnp.asarray(0.0, w.dtype),
                              jnp.asarray(0.0, w.dtype),
                              jnp.asarray(False))
                    (dwr, dsr, dzlr, dzur, al_r, a_dr,
                     r_ok) = _cond_any(use_resto, do_resto, zero_r)
                    use_resto = use_resto & r_ok
                    alpha = jnp.where(use_resto, 0.0, alpha)
                else:
                    dwr = dsr = None
                    dzlr, dzur = dzl, dzu
                    al_r = jnp.asarray(0.0, w.dtype)
                    a_dr = a_d
                if filter_mode:
                    # fallback for unrestorable failures: the alpha_min
                    # step keeps strictly positive progress (IPOPT would
                    # abort here; a batched solver must keep stepping)
                    fallback = ls_failed & ~use_resto
                    alpha = jnp.where(fallback,
                                      jnp.maximum(alpha_min,
                                                  a_p * 0.5 ** st.ls_max),
                                      alpha)
                w_n = w + alpha * dw
                s_n = s + alpha * ds
                if filter_mode and st.use_resto:
                    # select-gated, NOT multiplicative: 0 * NaN = NaN,
                    # so a failed restoration factorization must never
                    # touch the arithmetic of non-restoring elements
                    w_n = jnp.where(use_resto, w_n + al_r * dwr, w_n)
                    s_n = jnp.where(use_resto, s_n + al_r * dsr, s_n)
                lam_n = lam_b + alpha * dlam
                # NOTE (measured): scaling the dual RESPONSE part by the
                # primal alpha ("principled" linearization of the taken
                # step) was built and reverted — it degraded both DIP
                # (warm diverged 5e3) and the RTI closed-loop quality
                # (F err 0.094 > 0.06 gate).  The standard full dual step
                # with its own fraction-to-boundary a_d (IPOPT's alpha_z)
                # stays.
                if filter_mode:
                    eff_ad = jnp.where(use_resto, a_dr, a_d)
                    eff_dzl = jnp.where(use_resto, dzlr, dzl)
                    eff_dzu = jnp.where(use_resto, dzur, dzu)
                    zl_n = zl + eff_ad * eff_dzl
                    zu_n = zu + eff_ad * eff_dzu
                else:
                    zl_n = zl + a_d * dzl
                    zu_n = zu + a_d * dzu
                # keep duals sane relative to the barrier parameter
                # (IPOPT's kappa_Sigma safeguard)
                dl_w, dl_s = dist_l(w_n, s_n)
                du_w = dist_u(w_n)
                dl = jnp.concatenate([dl_w, dl_s])
                kap = 1e10
                zl_c = jnp.clip(zl_n,
                                mu_new / (kap * jnp.maximum(dl, _TINY)),
                                kap * mu_new / jnp.maximum(dl, _TINY))
                du = jnp.concatenate([du_w,
                                      jnp.full((q,), jnp.inf, w.dtype)])
                zu_c = jnp.where(
                    jnp.concatenate([has_ub, jnp.zeros((q,), bool)]),
                    jnp.clip(zu_n,
                             mu_new / (kap * jnp.maximum(du, _TINY)),
                             kap * mu_new / jnp.maximum(du, _TINY)),
                    0.0)

                if st.debug:
                    tau_d = jnp.maximum(st.tau_min, 1.0 - mu_new)
                    dlw_d, dls_d = dist_l(w, s)
                    duw_d = dist_u(w)
                    rat_l = jnp.where(has_lb & (dw < 0),
                                      -tau_d * dlw_d / jnp.where(
                                          dw == 0, -1.0, dw), jnp.inf)
                    rat_u = jnp.where(has_ub & (dw > 0),
                                      tau_d * duw_d / jnp.where(
                                          dw == 0, 1.0, dw), jnp.inf)
                    rat = jnp.minimum(rat_l, rat_u)
                    blk = jnp.argmin(rat)
                    jax.debug.print(
                        "   blocker: w[{b}] rat={r:.2e} dw={dwb:.2e} "
                        "dl={dlb:.2e} du={dub:.2e} s_min_rat={sr:.2e}",
                        b=blk, r=rat[blk], dwb=dw[blk], dlb=dlw_d[blk],
                        dub=duw_d[blk],
                        sr=(jnp.min(jnp.where(ds < 0, -tau_d * dls_d
                                              / jnp.where(ds == 0, -1.0,
                                                          ds), jnp.inf),
                                    initial=jnp.inf) if q else jnp.inf))
                    jax.debug.print(
                        "it={it} mu={mu:.1e} err0={e0:.2e} errmu={em:.2e} "
                        "d={ed:.1e} p={ep:.1e} phi={ph:.8e} th={th:.2e} "
                        "alpha={a:.2e} a_d={ad:.2e} nu={nu:.1e} "
                        "|dlam|={dl:.1e} |lam|={l:.1e} prox={px:.1e}",
                        it=stt.it, mu=mu_new, e0=err_0, em=err_mu,
                        ed=res0[0], ep=res0[1],
                        ph=barrier_value(w, s, p, mu_new),
                        th=constraint_violation(pre[1], pre[2], s),
                        a=alpha, ad=a_d, nu=nu,
                        dl=jnp.max(jnp.abs(dlam), initial=0.0),
                        l=jnp.max(jnp.abs(lam), initial=0.0),
                        px=stt.prox)
                if filter_mode:
                    # filter augmentation (W-B A-6): h-type acceptances
                    # and line-search failures carve the current
                    # (theta, phi) out of the acceptable region; f-type
                    # (Armijo) iterations never augment.  Feasible-point
                    # failures (theta ~ 0) are skipped: an entry with
                    # theta_j = 0 would forbid every phi >= phi_j at any
                    # theta — a deadlock, not a safeguard.
                    add_entry = ((~ls_failed) & (~f_type)
                                 | (ls_failed & (theta_k > 1e-12)))
                    slot_hot = (jnp.arange(st.filter_size)
                                == filt_n0 % st.filter_size)
                    filt_th1 = jnp.where(
                        slot_hot & add_entry,
                        (1.0 - st.gamma_theta) * theta_k, filt_th0)
                    filt_ph1 = jnp.where(
                        slot_hot & add_entry,
                        phi_k - st.gamma_phi * theta_k, filt_ph0)
                    filt_n1 = filt_n0 + add_entry
                    # per-iteration regularization (IPOPT-style): the
                    # successful delta decays between iterations instead
                    # of ratcheting on small alphas — the alpha-feedback
                    # rule manufactured the DIP prox death spiral (r5)
                    prox_n = jnp.where(
                        ls_failed,
                        jnp.maximum(delta_used, 1e-6) * 10.0,
                        jnp.where(alpha > 0.3, delta_used / 3.0,
                                  delta_used))
                else:
                    filt_th1, filt_ph1, filt_n1 = (filt_th0, filt_ph0,
                                                   filt_n0)
                    # Levenberg adaptation: small accepted steps -> more
                    # damping (tames huge Newton steps along flat
                    # directions that the line search would otherwise
                    # crush); good steps -> less damping.
                    prox_n = jnp.where(
                        alpha < 0.1, jnp.maximum(delta_used * 10.0, 1e-8),
                        jnp.where(alpha > 0.9, delta_used / 5.0,
                                  delta_used))
                prox_n = jnp.clip(prox_n, 0.0, st.prox_max)
                return (w_n, s_n, lam_n, zl_c, zu_c, mu_new, prox_n,
                        filt_th1, filt_ph1, filt_n1)

            (w_t2, s_t2, lam_t2, zl_t2, zu_t2, mu_t2, prox_n,
             fth_t2, fph_t2, fn_t2) = take_step()

            def frz(old, new):
                return jnp.where(converged, old, new)

            w_n = frz(w, w_t2)
            s_n = frz(s, s_t2)
            lam_n = frz(lam, lam_t2)
            zl_n = frz(zl, zl_t2)
            zu_n = frz(zu, zu_t2)
            mu_n = frz(mu, mu_t2)
            # watchdog: remember the best-seen iterate by true KKT error
            # (err_0 evaluates the CURRENT state, computed above anyway)
            improve = err_0 < stt.best_err
            best_n = tuple(jnp.where(improve, cur, old)
                           for cur, old in zip((w, s, lam, zl, zu),
                                               stt.best))
            best_err_n = jnp.where(improve, err_0, stt.best_err)
            return IPMState(
                w=w_n, s=s_n, lam=lam_n, zl=zl_n, zu=zu_n, mu=mu_n,
                it=stt.it + 1,
                converged=converged,
                kkt_err=err_0,
                prox=prox_n, best=best_n, best_err=best_err_n,
                filt_th=frz(stt.filt_th, fth_t2),
                filt_ph=frz(stt.filt_ph, fph_t2),
                filt_n=frz(stt.filt_n, fn_t2),
                th_max=stt.th_max, th_min=stt.th_min)

        return jax.lax.while_loop(cond, body, state)

    # -- real-time iteration: fixed number of full Newton steps at fixed mu --
    # The receding-horizon hot path (acados-style RTI): warm-started from the
    # previous step's primal-dual solution, each iteration is exactly one KKT
    # factorization + fraction-to-boundary step — no line search, no barrier
    # schedule, no convergence loop, so the compiled step has a fixed, minimal
    # cost.  The reference has no equivalent (IPOPT always iterates to
    # convergence, do_mpc/optimizer.py:731-787); this is the TPU-native answer
    # to its `compile_nlp` "make the hot loop cheap" intent (optimizer.py:678).
    def rti_loop(state: IPMState, p):
        def rti_newton(stt: IPMState, mu):
            w, s, lam, zl, zu = stt.w, stt.s, stt.lam, stt.zl, stt.zu
            (dw, ds, dlam, dzl, dzu, _soc, delta_used, dlam_pre,
             _resto) = newton_step(w, s, lam, zl, zu, p, mu,
                                   jnp.maximum(stt.prox, st.rti_prox))
            lam = lam + dlam_pre
            a_p, a_d = fraction_to_boundary(w, s, dw, ds, zl, zu, dzl, dzu,
                                            mu)
            # trust-region cap: scale the whole primal-dual update uniformly
            cap = jnp.minimum(1.0, st.rti_step_max
                              / (jnp.max(jnp.abs(dw), initial=0.0) + 1e-12))
            a_p = jnp.minimum(a_p, cap)
            a_d = jnp.minimum(a_d, cap)
            w_n = w + a_p * dw
            s_n = s + a_p * ds
            lam_n = lam + a_p * dlam
            zl_n = zl + a_d * dzl
            zu_n = zu + a_d * dzu
            dl_w, dl_s = dist_l(w_n, s_n)
            du_w = dist_u(w_n)
            dl = jnp.concatenate([dl_w, dl_s])
            kap = 1e10
            zl_n = jnp.clip(zl_n, mu / (kap * jnp.maximum(dl, _TINY)),
                            kap * mu / jnp.maximum(dl, _TINY))
            du = jnp.concatenate([du_w, jnp.full((q,), jnp.inf, w.dtype)])
            zu_n = jnp.where(
                jnp.concatenate([has_ub, jnp.zeros((q,), bool)]),
                jnp.clip(zu_n, mu / (kap * jnp.maximum(du, _TINY)),
                         kap * mu / jnp.maximum(du, _TINY)),
                0.0)
            return stt._replace(w=w_n, s=s_n, lam=lam_n, zl=zl_n,
                                zu=zu_n, it=stt.it + 1)

        def body(i, stt: IPMState):
            return rti_newton(stt, stt.mu * st.rti_mu_decay ** i)

        final = jax.lax.fori_loop(0, st.rti_iters, body, state)
        err = kkt_error(final.w, final.s, final.lam, final.zl, final.zu,
                        p, 0.0)
        if st.rti_drift_tol is not None:
            # bounded-drift RTI: pure RTI certifies nothing — its KKT
            # error drifts monotonically across plant steps (measured
            # r4: 2.3e-5 -> 2.6e-5 over 7 batch-reactor steps with
            # success=False by construction).  When the fixed iterations
            # leave the error above rti_drift_tol, corrective Newton
            # iterations at the barrier floor run until it re-enters the
            # band (or rti_extra_max is spent) — the acados-style
            # drift safeguard.  Elements already in-band take zero extra
            # trips under vmap.
            mu_ex = jnp.maximum(
                state.mu * st.rti_mu_decay ** st.rti_iters,
                st.tol * st.mu_min_factor)

            def e_cond(c):
                stt, k = c
                return (stt.kkt_err > st.rti_drift_tol) \
                    & (k < st.rti_extra_max)

            def e_body(c):
                stt, k = c
                stt2 = rti_newton(stt, mu_ex)
                err2 = kkt_error(stt2.w, stt2.s, stt2.lam, stt2.zl,
                                 stt2.zu, p, 0.0)
                return (stt2._replace(kkt_err=err2), k + 1)

            final, _ = jax.lax.while_loop(
                e_cond, e_body, (final._replace(kkt_err=err), 0))
            err = final.kkt_err
            return final._replace(
                converged=err <= jnp.maximum(st.rti_drift_tol, st.tol))
        return final._replace(kkt_err=err, converged=err <= st.tol)

    def init_state(w0, p, lam0=None, mu0=None, zl0=None, zu0=None):
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
        z0v = jnp.asarray(st.z_init, dtype)
        zl = jnp.concatenate([jnp.where(has_lb, z0v, 0.0),
                              jnp.full((q,), z0v, dtype)])
        zu = jnp.concatenate([jnp.where(has_ub, z0v, 0.0),
                              jnp.zeros((q,), dtype)])
        # Restart value for warm entries the previous solve zeroed
        # (active-set polish zeroes inactive duals).  RTI mode restarts
        # them at the central-path value min(z_init, mu/dist) — z_init=1
        # sits far off the central path and made the first damped RTI
        # Newton steps blow up (measured).  The globalized loop keeps the
        # plain z_init restart: its line search handles the off-path
        # start, and the central restart was measured to stall one
        # dynamic-bicycle closed-loop step at kkt_err ~2e-4 (a weakly
        # active bound restarted with a tiny/huge dual mid-horizon).
        # the filter-RTI hybrid runs the globalized body, so it keeps
        # the globalized loop's plain restart (central restart + filter
        # body measured kkt 0.21 after 8 capped iterations on the
        # oscillating-masses warm loop vs 1e-6 with the plain restart)
        use_central = st.rti_iters > 0 and not st.rti_filter
        if zl0 is not None:
            dl_w0, dl_s0 = dist_l(w, s)
            central_l = jnp.minimum(z0v, mu / jnp.maximum(
                jnp.concatenate([dl_w0, dl_s0]), 1e-8))
            mask_l0 = jnp.concatenate([has_lb, jnp.ones((q,), bool)])
            restart_l = central_l if use_central else zl
            zl = jnp.where(zl0 > 1e-12, jnp.maximum(zl0, mu / 1e8),
                           jnp.where(mask_l0, restart_l, 0.0))
        if zu0 is not None:
            du_w0 = dist_u(w)
            central_u = jnp.minimum(z0v, mu / jnp.maximum(
                jnp.concatenate([du_w0, jnp.ones((q,), w.dtype)]), 1e-8))
            mask_u0 = jnp.concatenate([has_ub, jnp.zeros((q,), bool)])
            restart_u = central_u if use_central else zu
            zu = jnp.where(zu0 > 1e-12, jnp.maximum(zu0, mu / 1e8),
                           jnp.where(mask_u0, restart_u, 0.0))
        gv0, hv0 = eval_all(w, p)
        theta0 = constraint_violation(gv0, hv0, s)
        theta0 = jnp.where(jnp.isfinite(theta0), theta0, 1.0)
        return IPMState(w=w, s=s, lam=lam, zl=zl, zu=zu, mu=mu,
                        it=jnp.asarray(0), converged=jnp.asarray(False),
                        kkt_err=jnp.asarray(jnp.inf, dtype),
                        prox=jnp.asarray(0.0, dtype),
                        best=(w, s, lam, zl, zu),
                        best_err=jnp.asarray(jnp.inf, dtype),
                        filt_th=jnp.full((st.filter_size,), jnp.inf,
                                         dtype),
                        filt_ph=jnp.full((st.filter_size,), jnp.inf,
                                         dtype),
                        filt_n=jnp.asarray(0),
                        th_max=1e4 * jnp.maximum(1.0, theta0),
                        th_min=1e-4 * jnp.maximum(1.0, theta0))

    def estimate_duals(w, s, zl, zu, p, mu):
        """Least-squares multiplier initialization for COLD solves (the
        IPOPT least_square_init_duals analogue): one proximal-weighted
        KKT solve at lam=0 returns the (barrier-metric) LS multipliers.
        Measured r5 cold anatomy: 6 of 14 flagship iterations were spent
        walking lam from 0 to ~380 against a dual residual of 900 — this
        removes that phase for one backsolve.  Runs OUTSIDE the solver
        loop on the statically-cold path only, so it adds no while-
        boundary to the hot program."""
        dl_w, dl_s = dist_l(w, s)
        du_w = dist_u(w)
        dl_w = jnp.maximum(dl_w, _TINY)
        du_w = jnp.maximum(du_w, _TINY)
        dl_s = jnp.maximum(dl_s, _TINY)
        sig_w = jnp.where(has_lb, zl[:n] / dl_w, 0.0) \
            + jnp.where(has_ub, zu[:n] / du_w, 0.0)
        inv_sig_s = dl_s / jnp.maximum(zl[n:], _TINY) if q \
            else jnp.zeros((0,), w.dtype)
        gf = grad_f(w, p)
        r_dw = gf - jnp.where(has_lb, mu / dl_w, 0.0) \
                  + jnp.where(has_ub, mu / du_w, 0.0)
        r_ds = -mu / dl_s if q else jnp.zeros((0,), w.dtype)
        zero_g = jnp.zeros((m,), w.dtype)
        r_h_ls = (-r_ds * inv_sig_s) if q else jnp.zeros((0,), w.dtype)
        if structured_solve is not None:
            if isinstance(structured_solve, tuple):
                ctx = structured_solve[0](w, p, zero_g,
                                          jnp.zeros((q,), w.dtype),
                                          sig_w, inv_sig_s)
                _, dg, dh = structured_solve[1](
                    ctx, r_dw, zero_g, r_h_ls,
                    jnp.asarray(st.refit_delta, w.dtype))
            else:
                _, dg, dh = structured_solve(
                    w, p, zero_g, jnp.zeros((q,), w.dtype), sig_w,
                    inv_sig_s, r_dw, zero_g, r_h_ls,
                    jnp.asarray(st.refit_delta, w.dtype))
        else:
            Jg = jac_g(w, p) if m else jnp.zeros((0, n), w.dtype)
            Jh = jac_h(w, p) if q else jnp.zeros((0, n), w.dtype)
            Hw = hess_fn(w, p, zero_g, jnp.zeros((q,), w.dtype))
            _, dg, dh = solve_kkt(Hw, sig_w, Jg, Jh, inv_sig_s, r_dw,
                                  zero_g, r_h_ls,
                                  jnp.asarray(st.refit_delta, w.dtype))
        lam_ls = jnp.concatenate([dg, dh])
        # guard: a garbage estimate from a degenerate init point must
        # not be worse than the plain lam=0 start
        ok = jnp.all(jnp.isfinite(lam_ls)) \
            & (jnp.max(jnp.abs(lam_ls), initial=0.0) < st.lam_init_max)
        if st.debug:
            jax.debug.print(
                "  estimate_duals: raw|lam|={l:.2e} finite={f} "
                "|r_dw|={r:.2e}",
                l=jnp.max(jnp.abs(lam_ls), initial=0.0),
                f=jnp.all(jnp.isfinite(lam_ls)),
                r=jnp.max(jnp.abs(r_dw), initial=0.0))
        return jnp.where(ok, lam_ls, 0.0)

    # -- active-set Newton polish ------------------------------------------
    # The barrier loop identifies the active set and gets within ~1e-3..1e-5;
    # a few full Newton steps with the active set FIXED (active bounds pinned
    # by a large quadratic penalty, inactive inequality multipliers driven to
    # zero) then converge quadratically to the exact KKT point — this is what
    # lets us match IPOPT's answers to 1e-8 without IPOPT's line-search
    # machinery fighting flat directions.
    BIG = 1e10

    def polish(w, s, lam, zl, zu, p):
        dl_w = jnp.where(has_lb, w - lb, jnp.inf)
        du_w = jnp.where(has_ub, ub - w, jnp.inf)
        act_lb = has_lb & (zl[:n] > dl_w)
        act_ub = has_ub & (zu[:n] > du_w)
        act_h = (zl[n:] > s) if q else jnp.zeros((0,), bool)
        act_b = act_lb | act_ub
        target = jnp.where(act_ub, ub, jnp.where(act_lb, lb, 0.0))
        target = jnp.where(jnp.isfinite(target), target, 0.0)

        def body(carry, _):
            w_, lam_ = carry
            lam_g, lam_h = lam_[:m], lam_[m:]
            gf = grad_f(w_, p)
            r_dw = gf + jgT_mv(w_, p, lam_g) + jhT_mv(w_, p, lam_h) \
                + BIG * jnp.where(act_b, w_ - target, 0.0)
            r_g = g(w_, p) if m else jnp.zeros((0,), w_.dtype)
            hv = h(w_, p) if q else jnp.zeros((0,), w_.dtype)
            # active ineq -> equality (inv_sig 0); inactive -> lam -> 0
            inv_sig = jnp.where(act_h, 0.0, BIG) if q \
                else jnp.zeros((0,), w_.dtype)
            r_h_mod = hv - lam_h * inv_sig
            sig_pol = jnp.where(act_b, BIG, 0.0)
            if isinstance(structured_solve, tuple):
                ctx_ = structured_solve[0](w_, p, lam_g, lam_h, sig_pol,
                                           inv_sig)
                dw_, dg_, dh_ = structured_solve[1](
                    ctx_, r_dw, r_g, r_h_mod, jnp.asarray(0.0, w_.dtype))
            elif structured_solve is not None:
                dw_, dg_, dh_ = structured_solve(
                    w_, p, lam_g, lam_h, sig_pol, inv_sig, r_dw, r_g,
                    r_h_mod, jnp.asarray(0.0, w_.dtype))
            else:
                Jg_ = jac_g(w_, p) if m else jnp.zeros((0, n), w_.dtype)
                Jh_ = jac_h(w_, p) if q else jnp.zeros((0, n), w_.dtype)
                Hw_ = hess_fn(w_, p, lam_g, lam_h)
                dw_, dg_, dh_ = solve_kkt(
                    Hw_, sig_pol, Jg_, Jh_, inv_sig, r_dw, r_g, r_h_mod,
                    jnp.asarray(0.0, w_.dtype))
            good = jnp.all(jnp.isfinite(dw_)) & jnp.all(jnp.isfinite(dg_)) \
                & jnp.all(jnp.isfinite(dh_))
            w_n = jnp.where(good, w_ + dw_, w_)
            lam_n = jnp.where(good, lam_ + jnp.concatenate([dg_, dh_]),
                              lam_)
            return (w_n, lam_n), None

        (w_p, lam_p), _ = jax.lax.scan(body, (w, lam), None, length=3)
        # recover bound duals and slacks consistent with the polished point
        lam_gp, lam_hp = lam_p[:m], lam_p[m:]
        r_stat = grad_f(w_p, p) + jgT_mv(w_p, p, lam_gp) \
            + jhT_mv(w_p, p, lam_hp)
        zl_p = jnp.concatenate([
            jnp.where(act_lb, jnp.maximum(r_stat, 0.0), 0.0),
            jnp.where(act_h, jnp.maximum(lam_hp, 0.0), 0.0)
            if q else jnp.zeros((0,), w.dtype)])
        zu_p = jnp.concatenate([
            jnp.where(act_ub, jnp.maximum(-r_stat, 0.0), 0.0),
            jnp.zeros((q,), w.dtype)])
        w_cl = jnp.clip(w_p, jnp.where(has_lb, lb, -jnp.inf),
                        jnp.where(has_ub, ub, jnp.inf))
        hv_p = h(w_cl, p) if q else jnp.zeros((0,), w.dtype)
        s_p = jnp.maximum(-hv_p, 0.0)
        return w_cl, s_p, lam_p, zl_p, zu_p

    def solve(w0, p, lam0=None, mu0=None, zl0=None, zu0=None,
              lb_dyn=None, ub_dyn=None):
        if lb_dyn is not None or ub_dyn is not None:
            if not dynamic_bounds:
                raise ValueError("pass dynamic_bounds=True to "
                                 "make_ipm_solver to use lb_dyn/ub_dyn")
            # functional rebinding: build a fresh solver whose closures
            # capture the per-solve (possibly traced) bound values, while
            # the finiteness masks stay the static ones — no shared
            # mutable state, so interleaved traces of the same solver
            # cannot observe each other's bounds.  make_ipm_solver is
            # pure Python function definitions, so this costs nothing at
            # trace time.
            lb_eff = (jnp.where(has_lb, jnp.asarray(lb_dyn), lb_static)
                      if lb_dyn is not None else lb_static)
            ub_eff = (jnp.where(has_ub, jnp.asarray(ub_dyn), ub_static)
                      if ub_dyn is not None else ub_static)
            inner = make_ipm_solver(
                f, g, h, lb_eff, ub_eff, n_eq, n_ineq, settings=settings,
                kkt_solve=kkt_solve, hess_fn=hess_fn,
                grad_f_fn=grad_f_fn, jac_g_fn=jac_g_fn,
                jac_h_fn=jac_h_fn, structured_solve=structured_solve,
                dynamic_bounds=False, _bound_masks=(has_lb, has_ub))
            return inner(w0, p, lam0=lam0, mu0=mu0, zl0=zl0, zu0=zu0)
        return _solve_impl(w0, p, lam0, mu0, zl0, zu0)

    def _solve_impl(w0, p, lam0=None, mu0=None, zl0=None, zu0=None):
        state = init_state(jnp.asarray(w0), p, lam0=lam0, mu0=mu0,
                           zl0=zl0, zu0=zu0)
        if st.cold_dual_init and (m + q) and st.rti_iters == 0:
            # Cold solves carry lam == 0 (both the static lam0=None path
            # and the batch layer's cold-emulation-through-the-warm-
            # program, parallel/batch.py).  The _cond_any sits OUTSIDE
            # the solver loop: warm batches take zero trips and the hot
            # loop body is untouched (the r3/r5 while-boundary cost
            # applies to boundaries inside the loop).
            pred = jnp.max(jnp.abs(state.lam), initial=0.0) == 0.0
            lam_ls = _cond_any(
                pred,
                lambda: estimate_duals(state.w, state.s, state.zl,
                                       state.zu, p, state.mu),
                jnp.zeros_like(state.lam))
            lam_n = jnp.where(pred, lam_ls, state.lam)
            if st.debug:
                jax.debug.print(
                    "cold_dual_init: pred={p} |lam_ls|={l:.2e}",
                    p=pred, l=jnp.max(jnp.abs(lam_ls), initial=0.0))
            state = state._replace(
                lam=lam_n, best=(state.w, state.s, lam_n, state.zl,
                                 state.zu))
        # RTI only makes sense from a warm primal-dual start: a cold start
        # (no lam0) always runs the full globalized loop, so the first solve
        # of a receding-horizon sequence converges properly and every
        # subsequent step takes the fixed-cost RTI path.
        if st.rti_iters > 0 and lam0 is not None:
            if st.rti_filter:
                # filter-RTI hybrid: the full globalized filter body
                # (line search, SOC, prox ladder) with a fixed small
                # iteration budget.  Pure RTI's undamped Newton steps
                # diverge on strongly nonlinear plants (DIP swing-up:
                # kkt -> 8.8e5, BENCH.md r5 item 10); this keeps the
                # per-step cost capped at rti_iters filter iterations
                # while retaining the globalization that makes those
                # steps safe.  With rti_drift_tol set, the exit
                # tolerance is the drift band and extra corrective
                # iterations (up to rti_extra_max) run only while the
                # state is outside it — warm in-band steps exit after
                # one body pass (the straight-line body still computes
                # its Newton step before the freeze, so the floor cost
                # is one iteration, not one residual check).
                etol = (st.tol if st.rti_drift_tol is None
                        else max(st.rti_drift_tol, st.tol))
                cap = st.rti_iters + (st.rti_extra_max
                                      if st.rti_drift_tol is not None
                                      else 0)
                final = solver_loop(state, p, it_cap=cap, exit_tol=etol)
                # the budget exit leaves final.w one step past the last
                # evaluated error — certify on an evaluated point (the
                # watchdog's best iterate vs. the freshly evaluated
                # final state, whichever is better)
                err_fin = kkt_error(final.w, final.s, final.lam,
                                    final.zl, final.zu, p, 0.0)
                wd = final.best_err < err_fin
                bw, bs, blam, bzl, bzu = final.best
                w_r = jnp.where(wd, bw, final.w)
                s_r = jnp.where(wd, bs, final.s)
                lam_r = jnp.where(wd, blam, final.lam)
                zl_r = jnp.where(wd, bzl, final.zl)
                zu_r = jnp.where(wd, bzu, final.zu)
                err_r = jnp.where(wd, final.best_err, err_fin)
                return IPMSolution(
                    w=w_r, s=s_r, lam=lam_r, zl=zl_r, zu=zu_r,
                    f=f(w_r, p), kkt_err=err_r, iterations=final.it,
                    success=err_r <= etol)
            final = rti_loop(state, p)
            return IPMSolution(
                w=final.w, s=final.s, lam=final.lam, zl=final.zl,
                zu=final.zu, f=f(final.w, p), kkt_err=final.kkt_err,
                iterations=final.it, success=final.converged)
        final = solver_loop(state, p)
        # a loose tol_loop exit must never certify success at the tight
        # tol on its own (the polish below, or nothing, closes the gap)
        strict = final.converged if loop_tol <= st.tol \
            else (final.converged & (final.kkt_err <= st.tol))
        if not st.do_polish:
            # watchdog (no extra evals): if an earlier iterate beat the
            # last checked error, return it instead of the final state.
            # <= so ties return the EVALUATED best tuple: kkt_err is the
            # error of the state the last body evaluated, while final.w
            # is the subsequently stepped point whose error was never
            # checked on a max_iter exit
            wd = final.best_err <= final.kkt_err
            bw, bs, blam, bzl, bzu = final.best
            w_r = jnp.where(wd, bw, final.w)
            s_r = jnp.where(wd, bs, final.s)
            lam_r = jnp.where(wd, blam, final.lam)
            zl_r = jnp.where(wd, bzl, final.zl)
            zu_r = jnp.where(wd, bzu, final.zu)
            err_r = jnp.where(wd, final.best_err, final.kkt_err)
            return IPMSolution(
                w=w_r, s=s_r, lam=lam_r, zl=zl_r,
                zu=zu_r, f=f(w_r, p), kkt_err=err_r,
                iterations=final.it, success=strict | (err_r <= st.tol))
        # watchdog: polish whichever of (final state, best-seen iterate)
        # has the smaller true KKT error
        err_fin = kkt_error(final.w, final.s, final.lam, final.zl,
                            final.zu, p, 0.0)
        wd = final.best_err < err_fin
        bw, bs, blam, bzl, bzu = final.best
        w_i = jnp.where(wd, bw, final.w)
        s_i = jnp.where(wd, bs, final.s)
        lam_i = jnp.where(wd, blam, final.lam)
        zl_i = jnp.where(wd, bzl, final.zl)
        zu_i = jnp.where(wd, bzu, final.zu)
        err_ipm = jnp.where(wd, final.best_err, err_fin)
        final = final._replace(w=w_i, s=s_i, lam=lam_i, zl=zl_i, zu=zu_i)
        w_p, s_p, lam_p, zl_p, zu_p = polish(
            final.w, final.s, final.lam, final.zl, final.zu, p)
        err_pol = kkt_error(w_p, s_p, lam_p, zl_p, zu_p, p, 0.0)
        if st.debug:
            jax.debug.print("polish: err_ipm={a:.2e} err_pol={b:.2e}",
                            a=err_ipm, b=err_pol)
        better = jnp.isfinite(err_pol) & (err_pol < err_ipm)

        def sel(a, b):
            return jnp.where(better, b, a)

        w_f = sel(final.w, w_p)
        s_f = sel(final.s, s_p)
        lam_f = sel(final.lam, lam_p)
        zl_f = sel(final.zl, zl_p)
        zu_f = sel(final.zu, zu_p)
        err_f = jnp.where(better, err_pol, err_ipm)
        # (A second polish pass from the first polished point was built
        # and measured: zero error improvement — the polish's ~1e-6
        # fixed point is its own numerical floor from a loose exit, not
        # active-set misidentification — at +50% wall.  Removed; the
        # loose-loop latency recipe certifies at solver_tol 1e-6.)
        return IPMSolution(
            w=w_f, s=s_f, lam=lam_f, zl=zl_f, zu=zu_f,
            f=f(w_f, p), kkt_err=err_f, iterations=final.it,
            success=strict | (err_f <= st.tol))

    return solve
