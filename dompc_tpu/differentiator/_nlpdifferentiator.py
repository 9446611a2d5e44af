"""Parametric NLP sensitivities via the implicit function theorem.

Re-design of the reference ``do_mpc/differentiator/_nlpdifferentiator.py``:
where the reference rebuilds the Lagrangian symbolically, detects the active
set by primal distance (ref :347-394) and solves the reduced KKT system
A s = -B with CasADi QR / scipy (ref :469-509), here the same active-set KKT
system is assembled from the optimizer's autodiff oracles and the
parameter-Jacobians come from ``jax.jacfwd`` — no symbolic bookkeeping.

Math (identical to ref :289-303): at a KKT point with active set fixed,

    [ H    A^T ] [ dw/dp   ]     [ d(grad_L)/dp ]
    [ A    0   ] [ dlam/dp ] = - [ d c_act /dp  ]

where A stacks the equality Jacobian, active inequality rows and active
bound unit rows.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .helper import NLPDifferentiatorSettings, NLPDifferentiatorStatus


class NLPDifferentiator:
    """Differentiates the optimizer's solution map p -> (w*(p), lam*(p)).

    Works for any object exposing the internal oracle interface of
    :class:`~dompc_tpu.controller.MPC` / :class:`~dompc_tpu.estimator.MHE`
    (``_grad_f_fn``, ``_jac_g_fn``, ``_jac_h_fn``, ``_hess_fn``,
    ``_lb_opt_x``, ``_ub_opt_x``).
    """

    def __init__(self, optimizer, settings: NLPDifferentiatorSettings = None):
        self.opt = optimizer
        self.settings = settings or NLPDifferentiatorSettings()
        self.status = NLPDifferentiatorStatus()

    def _active_sets(self, w, lam, zl, zu):
        """Active bounds/inequalities by primal distance AND dual
        magnitude (reference :347-394: 'primal' vs 'dual' detection; we
        take the union so constraints held active by a significant
        multiplier are kept even when the primal sits tol-outside).
        Also records strict complementarity: entries where both the
        primal gap and the dual are ~0 make the sensitivity set-valued
        (reference SC check, :606-647)."""
        opt = self.opt
        lb, ub = opt._lb_opt_x, opt._ub_opt_x
        tol = self.settings.active_set_tol
        m = opt.n_opt_lagr
        q = opt._n_ineq
        lam_h = lam[m:m + q]
        prim_lb = np.isfinite(lb) & (w - lb < tol)
        prim_ub = np.isfinite(ub) & (ub - w < tol)
        # dual-magnitude union threshold, relative to the dual scale of
        # THIS solution (a fixed absolute cutoff misclassifies badly
        # scaled problems; reference uses tolerance-relative logic,
        # _nlpdifferentiator.py:347-394).  The scale is the mean |dual|
        # over the above-tol subset rather than the max: one strongly-
        # active constraint with a huge multiplier must not raise the
        # bar enough to deactivate moderately-active constraints.
        all_d = np.concatenate([np.abs(zl[:len(w)]), np.abs(zu[:len(w)]),
                                np.abs(lam_h)])
        # scale from the ACTIVE subset only: the mean over all duals is
        # dominated by the near-zero inactive multipliers and would clamp
        # to 1.0 on any reasonably scaled problem, defeating the
        # scale-relative intent
        act_d = all_d[all_d > tol]
        dual_scale = max(1.0, float(act_d.mean()) if act_d.size else 0.0)
        dual_thr = np.sqrt(tol) * dual_scale
        act_lb = prim_lb | (zl[:len(w)] > dual_thr)
        act_ub = prim_ub | (zu[:len(w)] > dual_thr)
        hv = np.asarray(opt._h_fn(jnp.asarray(w),
                                  jnp.asarray(opt.opt_p_num)))
        prim_h = hv > -tol
        act_h = prim_h | (lam_h > dual_thr)
        # strict complementarity: every active constraint needs a
        # clearly-positive multiplier
        weak = (np.any(prim_lb & (zl[:len(w)] <= tol))
                or np.any(prim_ub & (zu[:len(w)] <= tol))
                or np.any(prim_h & (lam_h <= tol)))
        if self.settings.check_SC:
            self.status.SC = not weak
        return act_lb, act_ub, act_h

    def differentiate(self, w=None, lam=None, pvec=None):
        """Return (dw_dp, dlam_dp) at the optimizer's current solution."""
        opt = self.opt
        w = np.asarray(opt.opt_x_num if w is None else w)
        lam = np.asarray(opt.lam_g_num if lam is None else lam)
        pvec = np.asarray(opt.opt_p_num if pvec is None else pvec)
        m = opt.n_opt_lagr
        q = opt._n_ineq
        n = w.shape[0]
        lam_g, lam_h = lam[:m], lam[m:m + q]
        zl = getattr(opt, "_zl_warm", np.zeros(n))[:n]
        zu = getattr(opt, "_zu_warm", np.zeros(n))[:n]

        act_lb, act_ub, act_h = self._active_sets(w, lam, zl, zu)
        act_b = act_lb | act_ub

        wj, pj = jnp.asarray(w), jnp.asarray(pvec)
        H = np.asarray(opt._hess_fn(wj, pj, jnp.asarray(lam_g),
                                    jnp.asarray(lam_h)))
        Jg = np.asarray(opt._jac_g_fn(wj, pj))
        Jh = (np.asarray(opt._jac_h_fn(wj, pj)) if q
              else np.zeros((0, n)))
        I_act = np.eye(n)[act_b]
        A = np.vstack([Jg, Jh[act_h], I_act])
        n_act = A.shape[0]

        # parameter derivatives via jacfwd in p
        def lag_grad_p(p_):
            gl = opt._grad_f_fn(wj, p_)
            gl = gl + jax.vjp(lambda ww: opt._g_fn(ww, p_), wj)[1](
                jnp.asarray(lam_g))[0]
            if q:
                gl = gl + jax.vjp(lambda ww: opt._h_fn(ww, p_), wj)[1](
                    jnp.asarray(lam_h))[0]
            return gl

        dgl_dp = np.asarray(jax.jacfwd(lag_grad_p)(pj))
        dg_dp = np.asarray(jax.jacfwd(lambda p_: opt._g_fn(wj, p_))(pj))
        dh_dp = (np.asarray(jax.jacfwd(
            lambda p_: opt._h_fn(wj, p_))(pj))[act_h] if q
            else np.zeros((0, pvec.shape[0])))
        dc_dp = np.vstack([dg_dp, dh_dp,
                           np.zeros((int(act_b.sum()), pvec.shape[0]))])

        dim = n + n_act
        K = np.zeros((dim, dim))
        K[:n, :n] = H
        K[:n, n:] = A.T
        K[n:, :n] = A
        rhs = -np.vstack([dgl_dp, dc_dp])

        if self.settings.check_LICQ:
            self.status.LICQ = bool(
                np.linalg.matrix_rank(A, tol=1e-8) == n_act)
        if self.settings.check_rank:
            self.status.full_rank = bool(
                np.linalg.matrix_rank(K, tol=1e-8) == dim)
        try:
            sens = np.linalg.solve(K, rhs)
            self.status.lse_solved = True
        except np.linalg.LinAlgError:
            if not self.settings.lstsq_fallback:
                raise
            sens, *_ = np.linalg.lstsq(K, rhs, rcond=None)
            self.status.lse_solved = True
        if self.settings.track_residuals:
            self.status.residuals = float(
                np.max(np.abs(K @ sens - rhs)))
        dw_dp = sens[:n]
        dlam_dp = sens[n:]
        return dw_dp, dlam_dp


class DoMPCDifferentiator(NLPDifferentiator):
    """Adapter for MPC/MHE instances (reference :710-870): rescales the
    primal sensitivities to physical units and exposes named queries."""

    def differentiate(self, **kw):
        dw_dp, dlam_dp = super().differentiate(**kw)
        scal = self.opt.opt_x_scaling
        self.dx_dp_num = dw_dp * scal[:, None]
        self.dlam_dp_num = dlam_dp
        return self.dx_dp_num, self.dlam_dp_num

    @property
    def sens_num(self):
        class _Q:
            def __init__(self, outer):
                self.outer = outer

            def __getitem__(self, key):
                assert key[0] == "dxdp"
                return self.outer.dx_dp_num
        return _Q(self)

    def du0_dx0(self):
        """Sensitivity of the first input w.r.t. the measured state —
        the quantity used for explicit-MPC style analysis."""
        opt = self.opt
        dx_dp, _ = self.differentiate()
        u_sl = opt.layout.sl(("u", 0, 0))
        x0_sl = opt._p_sl["x0"]
        return dx_dp[u_sl, x0_sl]
