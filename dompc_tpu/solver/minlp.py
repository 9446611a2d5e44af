"""Batched branch-and-bound for mixed-integer NMPC.

The reference delegates MINLP (models with ``input_type_integer`` inputs,
do_mpc/model/_model.py:127-128) to BONMIN's branch-and-bound
(do_mpc/controller/_mpc.py:1317-1324).  The TPU-native equivalent keeps
the tree search on the host but evaluates NLP relaxations in *batches*:
every frontier expansion solves up to ``batch_width`` node relaxations as
ONE vmapped interior-point call — the tree search costs a handful of
device dispatches instead of one per node.

Node relaxations differ from the root problem only in the bound values on
the integer-input entries of the decision vector, so a single compiled
solver with ``dynamic_bounds=True`` (solver/ipm.py) serves every node.
Fixed integers (lb == ub after branching) are kept as an epsilon-box so
the log barrier stays defined; the incumbent's integer entries are snapped
to the exact integers on extraction.
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .ipm import make_ipm_solver, IPMSettings


@dataclass
class BnBResult:
    w: np.ndarray          # incumbent decision vector (integral entries)
    f: float               # incumbent objective
    success: bool          # an integral incumbent was found
    n_nodes: int           # relaxations solved (excluding the root)
    gap: float             # |best remaining lower bound - incumbent|
    lam: np.ndarray | None = None
    zl: np.ndarray | None = None
    zu: np.ndarray | None = None


class BranchAndBound:
    """Best-first branch-and-bound over the integer entries of an MPC/MHE
    decision vector.

    Parameters mirror what BONMIN gets from the reference: the NLP oracle
    functions and bounds come from the already-set-up optimizer instance.
    ``int_idx`` are indices into the decision vector, ``int_scale`` the
    per-entry scaling (integrality is imposed on ``w * scale``).
    """

    def __init__(self, opt, int_idx, int_scale, tol=1e-8, max_iter=150,
                 batch_width=8, max_nodes=64, int_tol=1e-5, gap_tol=1e-8,
                 eps_fix=1e-6):
        self.int_idx = np.asarray(int_idx, int)
        self.int_scale = np.asarray(int_scale, float)
        self.batch_width = int(batch_width)
        self.max_nodes = int(max_nodes)
        self.int_tol = float(int_tol)
        self.gap_tol = float(gap_tol)
        self.eps_fix = float(eps_fix)
        lb, ub = opt._lb_opt_x, opt._ub_opt_x
        if not (np.all(np.isfinite(lb[self.int_idx]))
                and np.all(np.isfinite(ub[self.int_idx]))):
            raise ValueError(
                "branch-and-bound needs finite bounds on every integer "
                "input (set mpc.bounds for them)")
        self._lb0, self._ub0 = lb, ub
        structured = None
        settings = IPMSettings(tol=tol, max_iter=max_iter, reg_retries=2,
                               use_soc=False, do_polish=False)
        if hasattr(opt, "_make_structured_solve") \
                and hasattr(opt, "_struct_parts"):
            structured = opt._make_structured_solve(settings.delta_cons)
        solve = make_ipm_solver(
            opt._f_fn, opt._g_fn, opt._h_fn, lb, ub,
            opt.n_opt_lagr, opt._n_ineq, settings=settings,
            hess_fn=opt._hess_fn, grad_f_fn=opt._grad_f_fn,
            jac_g_fn=opt._jac_g_fn, jac_h_fn=opt._jac_h_fn,
            structured_solve=structured, dynamic_bounds=True)

        def node_solve(w0, pvec, lam0, zl0, zu0, lbd, ubd):
            return solve(w0, pvec, lam0=lam0, mu0=jnp.asarray(1e-2),
                         zl0=zl0, zu0=zu0, lb_dyn=lbd, ub_dyn=ubd)

        self._vsolve = jax.jit(jax.vmap(
            node_solve, in_axes=(None, None, None, None, None, 0, 0)))

    # -- host-side tree search ------------------------------------------
    def _fractionality(self, w):
        vals = w[self.int_idx] * self.int_scale
        return np.abs(vals - np.round(vals))

    def refine(self, pvec, root) -> BnBResult:
        """Run B&B below an already-solved root relaxation.

        ``root``: IPMSolution of the continuous relaxation (arrays host- or
        device-side).  Returns the incumbent; ``success=False`` only when no
        integral point was found within the node budget.
        """
        w_root = np.asarray(root.w, float)
        lam_root = jnp.asarray(root.lam)
        zl_root = jnp.asarray(root.zl)
        zu_root = jnp.asarray(root.zu)
        f_root = float(root.f)
        frac = self._fractionality(w_root)
        if frac.max(initial=0.0) <= self.int_tol:
            w_out = self._snap(w_root)
            return BnBResult(w=w_out, f=f_root, success=True, n_nodes=0,
                             gap=0.0, lam=np.asarray(root.lam),
                             zl=np.asarray(root.zl), zu=np.asarray(root.zu))

        inc_f = np.inf
        inc = None
        n_nodes = 0
        counter = 0  # heap tiebreaker
        # heap entries: (parent_bound, counter, lb, ub)
        frontier = []
        for lbn, ubn in self._branch(w_root, self._lb0.copy(),
                                     self._ub0.copy(), frac):
            frontier.append((f_root, counter, lbn, ubn))
            counter += 1
        heapq.heapify(frontier)
        w0j = jnp.asarray(w_root)
        pvecj = jnp.asarray(pvec)

        while frontier and n_nodes < self.max_nodes:
            batch = []
            while frontier and len(batch) < self.batch_width:
                bound, _, lbn, ubn = heapq.heappop(frontier)
                if bound >= inc_f - self.gap_tol:
                    continue  # pruned by incumbent
                batch.append((bound, lbn, ubn))
            if not batch:
                break
            lbs = jnp.asarray(np.stack([b[1] for b in batch]))
            ubs = jnp.asarray(np.stack([b[2] for b in batch]))
            sols = self._vsolve(w0j, pvecj, lam_root, zl_root, zu_root,
                                lbs, ubs)
            n_nodes += len(batch)
            ws = np.asarray(sols.w, float)
            fs = np.asarray(sols.f, float)
            oks = np.asarray(sols.success, bool)
            lams = np.asarray(sols.lam)
            zls = np.asarray(sols.zl)
            zus = np.asarray(sols.zu)
            for i, (bound, lbn, ubn) in enumerate(batch):
                if not oks[i]:
                    continue  # infeasible / non-converged: prune
                if fs[i] >= inc_f - self.gap_tol:
                    continue
                frac = self._fractionality(ws[i])
                if frac.max(initial=0.0) <= self.int_tol:
                    inc_f = fs[i]
                    inc = (self._snap(ws[i]), lams[i], zls[i], zus[i])
                    continue
                for lbc, ubc in self._branch(ws[i], lbn, ubn, frac):
                    heapq.heappush(frontier,
                                   (fs[i], counter, lbc, ubc))
                    counter += 1
        gap = frontier[0][0] - inc_f if frontier and inc is not None \
            else 0.0
        if inc is None:
            return BnBResult(w=w_root, f=f_root, success=False,
                             n_nodes=n_nodes, gap=np.inf)
        w_inc, lam_inc, zl_inc, zu_inc = inc
        return BnBResult(w=w_inc, f=inc_f, success=True, n_nodes=n_nodes,
                         gap=float(max(gap, 0.0)) if frontier else 0.0,
                         lam=lam_inc, zl=zl_inc, zu=zu_inc)

    def _snap(self, w):
        w = np.array(w, float)
        vals = np.round(w[self.int_idx] * self.int_scale)
        w[self.int_idx] = vals / self.int_scale
        return w

    def _branch(self, w, lbn, ubn, frac):
        """Two children splitting the most fractional integer entry."""
        j = int(np.argmax(frac))
        gj = self.int_idx[j]
        sc = self.int_scale[j]
        v = w[gj] * sc
        lo_int, hi_int = np.floor(v), np.ceil(v)
        eps = self.eps_fix * max(1.0, abs(v)) / sc
        children = []
        # down child: u_j <= floor(v)
        lbd, ubd = lbn.copy(), ubn.copy()
        ubd[gj] = lo_int / sc
        if ubd[gj] - lbd[gj] < eps:          # collapsed: epsilon-box
            lbd[gj] = ubd[gj] - eps
        if lbd[gj] <= ubd[gj]:
            children.append((lbd, ubd))
        # up child: u_j >= ceil(v)
        lbu, ubu = lbn.copy(), ubn.copy()
        lbu[gj] = hi_int / sc
        if ubu[gj] - lbu[gj] < eps:
            ubu[gj] = lbu[gj] + eps
        if lbu[gj] <= ubu[gj]:
            children.append((lbu, ubu))
        return children
