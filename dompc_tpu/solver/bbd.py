"""Bordered-block-diagonal (arrowhead) KKT factorization.

The scenario-tree OCP KKT system is *not* merely stage-banded: after the
robust horizon every leaf scenario is an independent stage chain, and the
chains couple only through the shared tree-ancestor variables (plus any
globally-coupled variables: open-loop inputs, single-slack eps, MHE's
estimated parameters).  The reference hands this structure to IPOPT's
general sparse linear solvers (do_mpc/optimizer.py:731-787, MUMPS/MA27);
here it is exploited directly:

    K = [ A   B ]     A = blkdiag over chains of block-tridiagonal bands
        [ B^T R ]     B = border (chain rows x root cols), R = small root

Solve by Schur complement on the root:

    1. one batched multi-RHS block-QR sweep per chain:
       Y_c = A_c^{-1} [B_c, rhs_c]                      (vmap over chains)
    2. S = R - sum_c B_c^T Y_c[:, :r];  x_r = S^{-1} (rhs_r - sum B^T y)
    3. x_c = y_c - Y_c[:, :r] x_r                       (no second sweep)

Versus grouping all scenarios of a stage into one band block (b ~ 325 for
the 9-branch CSTR tree), per-chain blocks are ~10x smaller -- QR panel
flops drop ~100-500x and the chain dimension becomes extra batch
parallelism for the MXU.  The block-QR sweep is pivot-free with bounded
growth, which keeps float32 TPU solves stable on barely-regularized
interior-point KKT systems.

Chain/root assignment is *computed from usage*, not assumed: any variable
referenced by more than one chain, or across a stage span > 1, is demoted
to the root (see ``demote_by_usage``).  This one mechanism covers scenario
trees, ``nl_cons_single_slack``, open-loop robust MPC and MHE parameter
estimation (bordered band).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

ROOT = -1       # chain id of root-assigned entities
PARAM = -2      # chain id of parameter/dummy columns (dropped)


def _gather_plan(targets, srcs, garbage, t_size, k_low=4):
    """Invert a scatter-add into a two-tier gather plan.

    ``targets[i] = t`` means source position ``srcs[i]`` contributes to
    flat slot ``t``.  TPU scatter-add serializes colliding indices, so
    assembly runs as dense gathers instead — but padding every slot to
    the GLOBAL max multiplicity is wasteful when a handful of slots (the
    root block, which every instance touches) have 5-20 contributions
    while the band slots have 1-4 (measured: K=19 padded the whole
    123k-slot matrix and was slower than the scatter).  Two tiers:
    ``low`` covers all slots at width ``k_low``; the few slots with more
    contributions get their own narrow-tall matrix plus a unique-index
    scatter of their sums.  The garbage slot (``t_size - 1``) is excluded
    (it collects every dropped entry) and must be written as 0.
    Apply with :func:`_gather_apply`."""
    targets = np.asarray(targets).reshape(-1)
    srcs = np.asarray(srcs).reshape(-1)
    pad = int(srcs.max(initial=-1)) + 1
    keep = targets != garbage
    tk, sk = targets[keep], srcs[keep]
    order = np.argsort(tk, kind="stable")
    tk, sk = tk[order], sk[order]
    counts = np.bincount(tk, minlength=t_size - 1)
    K = max(int(counts.max(initial=0)), 1)
    k_low = min(k_low, K)
    first = np.zeros(t_size - 1, np.int64)
    first[1:] = np.cumsum(counts)[:-1]
    rank = np.arange(len(tk)) - first[tk]

    high_slots = np.nonzero(counts > k_low)[0].astype(np.int32)
    is_high = np.zeros(t_size - 1, bool)
    is_high[high_slots] = True
    high_row = np.cumsum(is_high) - 1        # slot -> row in high_mat

    low_mat = np.full((t_size - 1, k_low), pad, dtype=np.int32)
    sel = ~is_high[tk]
    low_mat[tk[sel], rank[sel]] = sk[sel]
    high_mat = np.full((len(high_slots), K), pad, dtype=np.int32)
    sel = is_high[tk]
    high_mat[high_row[tk[sel]], rank[sel]] = sk[sel]
    return {"low": low_mat, "high_slots": high_slots,
            "high": high_mat, "pad": pad}


def _gather_apply(plan, V):
    """Evaluate a _gather_plan.  ``V``: source vector WITH a trailing zero
    at the pad position.  Returns T of length t_size - 1."""
    T = V[jnp.asarray(plan["low"])].sum(axis=1)
    if plan["high_slots"].size:
        hs = V[jnp.asarray(plan["high"])].sum(axis=1)
        T = T.at[jnp.asarray(plan["high_slots"])].add(hs)
    return T


def demote_by_usage(var_chain, var_stage, A_all, n, inst_chain, inst_stage):
    """Demote variables to the root wherever the proposed chain assignment
    cannot be represented in the (band, border, root) structure.

    A variable stays on a chain only if every *chain* instance referencing
    it belongs to that same chain, the referencing stages span at most one
    block, and the variable's own stage is adjacent to all of them.
    """
    var_chain = np.asarray(var_chain, int).copy()
    var_stage = np.asarray(var_stage, int).copy()
    I, d = A_all.shape
    cols = A_all.reshape(-1)
    ich = np.repeat(np.asarray(inst_chain, int), d)
    ist = np.repeat(np.asarray(inst_stage, int), d)
    ok = (cols < n) & (ich != ROOT)
    cols, ich, ist = cols[ok], ich[ok], ist[ok]

    cmin = np.full(n, np.iinfo(np.int64).max)
    cmax = np.full(n, np.iinfo(np.int64).min)
    smin = np.full(n, np.iinfo(np.int64).max)
    smax = np.full(n, np.iinfo(np.int64).min)
    np.minimum.at(cmin, cols, ich)
    np.maximum.at(cmax, cols, ich)
    np.minimum.at(smin, cols, ist)
    np.maximum.at(smax, cols, ist)

    used = cmax >= 0
    bad = used & (
        (cmin != cmax)                      # referenced by >1 chain
        | (var_chain >= 0) & (var_chain != cmax)  # not the owning chain
        | (smax - smin > 1)                 # stage span too wide
        | (var_stage < smax - 1)            # own stage not adjacent
        | (var_stage > smin + 1))
    var_chain[bad & (var_chain >= 0)] = ROOT
    # chain-proposed but never referenced by a chain instance: keep (it
    # still occupies its block; bounds/diagonal terms reach it there).
    return var_chain, var_stage


class BBDAssembler:
    """Precomputed scatter maps from instance-local derivative tensors into
    the (band, border, root) representation.

    Parameters give, for every primal variable and every constraint row, a
    chain id (``ROOT`` for root) and a chain-stage.  ``A_all`` maps each
    instance's local variables to global columns (columns >= n are
    parameters and are dropped); ``R_g``/``R_h`` map instance rows to
    global equality/inequality rows.
    """

    def __init__(self, var_chain, var_stage, g_chain, g_stage,
                 h_chain, h_stage, A_all, R_g, R_h, n, m, q,
                 init_cols=None):
        var_chain = np.asarray(var_chain, int)
        var_stage = np.asarray(var_stage, int)
        g_chain = np.asarray(g_chain, int)
        g_stage = np.asarray(g_stage, int)
        h_chain = np.asarray(h_chain, int)
        h_stage = np.asarray(h_stage, int)
        self.n, self.m, self.q = n, m, q
        I, d = A_all.shape
        E = R_g.shape[1]

        C = int(max(var_chain.max(initial=-1), g_chain.max(initial=-1),
                    h_chain.max(initial=-1))) + 1
        C = max(C, 1)
        S = 1 + int(max(
            var_stage[var_chain >= 0].max(initial=0),
            g_stage[g_chain >= 0].max(initial=0),
            h_stage[h_chain >= 0].max(initial=0)))
        self.C, self.S = C, S

        # ---- local positions ------------------------------------------
        # chain blocks: rows ordered [w, lam_g, lam_h] per (chain, stage);
        # root: [w_root, lam_g_root, lam_h_root].
        w_loc = np.zeros(n, int)
        g_loc = np.zeros(m, int)
        h_loc = np.zeros(max(q, 1), int)[:q]
        sizes = np.zeros((C, S), int)

        root_count = 0
        for arr_chain, arr_stage, arr_loc in (
                (var_chain, var_stage, w_loc),
                (g_chain, g_stage, g_loc),
                (h_chain, h_stage, h_loc)):
            for c in range(C):
                for k in range(S):
                    sel = np.nonzero((arr_chain == c) & (arr_stage == k))[0]
                    arr_loc[sel] = sizes[c, k] + np.arange(len(sel))
                    sizes[c, k] += len(sel)
            sel = np.nonzero(arr_chain == ROOT)[0]
            arr_loc[sel] = root_count + np.arange(len(sel))
            root_count += len(sel)

        R = root_count
        self.R = R
        b = int(sizes.max()) + 1          # last slot = trash
        self.b = b
        tr = b - 1

        band_sz = C * S * b * b
        bord_sz = C * S * b * R
        root_sz = R * R
        self.T_size = 3 * band_sz + bord_sz + root_sz + 1
        garbage = self.T_size - 1
        bord_off = 3 * band_sz
        root_off = bord_off + bord_sz

        def flat_band(band, chain, stage, r, c):
            return (band * band_sz
                    + ((chain * S + stage) * b + r) * b + c)

        def pair_idx(r_ch, r_st, r_lc, c_ch, c_st, c_lc):
            """Map a (row, col) entry to its flat slot in T."""
            r_ch, r_st, r_lc, c_ch, c_st, c_lc = np.broadcast_arrays(
                r_ch, r_st, r_lc, c_ch, c_st, c_lc)
            out = np.full(r_ch.shape, garbage, dtype=np.int64)
            # chain x same chain
            both = (r_ch >= 0) & (c_ch == r_ch)
            ds = c_st - r_st
            sel = both & (ds == 0)
            out[sel] = flat_band(0, r_ch[sel], r_st[sel], r_lc[sel],
                                 c_lc[sel])
            sel = both & (ds == 1)
            out[sel] = flat_band(1, r_ch[sel], r_st[sel], r_lc[sel],
                                 c_lc[sel])
            sel = both & (ds == -1)
            out[sel] = flat_band(2, r_ch[sel],
                                 np.maximum(r_st[sel] - 1, 0), r_lc[sel],
                                 c_lc[sel])
            # chain row x root col -> border
            sel = (r_ch >= 0) & (c_ch == ROOT)
            out[sel] = (bord_off
                        + ((r_ch[sel] * S + r_st[sel]) * b
                           + r_lc[sel]) * R + c_lc[sel])
            # root x root
            sel = (r_ch == ROOT) & (c_ch == ROOT)
            out[sel] = root_off + r_lc[sel] * R + c_lc[sel]
            # root row x chain col: dropped; recovered by symmetry since
            # every insertion writes both orientations.
            return out

        # column maps for the extended instance vector
        zcol = np.minimum(A_all, n - 1)
        col_ch = np.where(A_all < n, var_chain[zcol], PARAM)
        col_st = np.where(A_all < n, var_stage[zcol], 0)
        col_lc = np.where(A_all < n, w_loc[zcol], 0)

        self.h_idx = pair_idx(
            col_ch[:, :, None], col_st[:, :, None], col_lc[:, :, None],
            col_ch[:, None, :], col_st[:, None, :],
            col_lc[:, None, :]).astype(np.int64)

        g_row_ch = g_chain[R_g]
        g_row_st = g_stage[R_g]
        g_row_lc = g_loc[R_g]
        self.jg_idx = pair_idx(
            g_row_ch[:, :, None], g_row_st[:, :, None],
            g_row_lc[:, :, None],
            col_ch[:, None, :], col_st[:, None, :], col_lc[:, None, :])
        self.jg_idx_T = pair_idx(
            col_ch[:, None, :], col_st[:, None, :], col_lc[:, None, :],
            g_row_ch[:, :, None], g_row_st[:, :, None],
            g_row_lc[:, :, None])
        if q:
            h_row_ch = h_chain[R_h]
            h_row_st = h_stage[R_h]
            h_row_lc = h_loc[R_h]
            self.jh_idx = pair_idx(
                h_row_ch[:, :, None], h_row_st[:, :, None],
                h_row_lc[:, :, None],
                col_ch[:, None, :], col_st[:, None, :],
                col_lc[:, None, :])
            self.jh_idx_T = pair_idx(
                col_ch[:, None, :], col_st[:, None, :], col_lc[:, None, :],
                h_row_ch[:, :, None], h_row_st[:, :, None],
                h_row_lc[:, :, None])
        else:
            self.jh_idx = self.jh_idx_T = np.zeros((I, 0, d), np.int64)

        # diagonal entries
        self.w_diag_idx = pair_idx(var_chain, var_stage, w_loc,
                                   var_chain, var_stage, w_loc)
        self.g_diag_idx = pair_idx(g_chain, g_stage, g_loc,
                                   g_chain, g_stage, g_loc)
        self.h_diag_idx = pair_idx(h_chain, h_stage, h_loc,
                                   h_chain, h_stage, h_loc)

        # initial-condition identity rows (first len(init_cols) eq rows)
        if init_cols is not None and len(init_cols):
            nx0 = len(init_cols)
            ic = np.asarray(init_cols, int)
            self.init_idx = np.concatenate([
                pair_idx(g_chain[:nx0], g_stage[:nx0], g_loc[:nx0],
                         var_chain[ic], var_stage[ic], w_loc[ic]),
                pair_idx(var_chain[ic], var_stage[ic], w_loc[ic],
                         g_chain[:nx0], g_stage[:nx0], g_loc[:nx0])])
        else:
            self.init_idx = np.zeros((0,), np.int64)

        # rhs scatter / solution gather: flat vector [chain part, root part]
        # chain part shape (C, S, b) flattened; root part (R,)
        def pos(ch, st, lc):
            chain_flat = (ch * S + st) * b + lc
            return np.where(ch >= 0, chain_flat, C * S * b + lc)

        self.w_pos = pos(var_chain, var_stage, w_loc).astype(np.int64)
        self.g_pos = pos(g_chain, g_stage, g_loc).astype(np.int64)
        self.h_pos = pos(h_chain, h_stage, h_loc).astype(np.int64)
        self.vec_size = C * S * b + R

        # identity diagonal on unused padding slots
        pad = np.zeros((C, S, b))
        for c in range(C):
            for k in range(S):
                pad[c, k, sizes[c, k]:b - 1] = 1.0
        self.pad_diag = pad
        # primal-variable diagonal masks: lets the caller add the retry
        # ladder's extra regularization delta to an already-assembled
        # system without re-running derivatives + scatter
        mask = np.zeros(self.vec_size)
        mask[self.w_pos] = 1.0
        self.w_mask_chain = mask[:C * S * b].reshape(C, S, b)
        self.w_mask_root = mask[C * S * b:]
        self._band_sz = band_sz
        self._bord_off = bord_off
        self._root_off = root_off

        # gather-form assembly plan (see _gather_plan): sources are
        # [H_i.flat | Jg_i.flat (used for both orientations) | Jh_i.flat
        # (both orientations) | ones(init) | sig_w_delta | g_diag | h_diag
        # | 0-pad]
        nH = I * d * d
        nJg = I * E * d
        nJh = I * self.jh_idx.shape[1] * d if q else 0
        sJg = np.arange(nJg) + nH
        sJh = np.arange(nJh) + nH + nJg
        off = nH + nJg + nJh
        targets = [self.h_idx, self.jg_idx, self.jg_idx_T]
        srcs = [np.arange(nH), sJg, sJg]
        if q:
            targets += [self.jh_idx, self.jh_idx_T]
            srcs += [sJh, sJh]
        targets += [self.init_idx]
        srcs += [np.arange(len(self.init_idx)) + off]
        off += len(self.init_idx)
        targets += [self.w_diag_idx, self.g_diag_idx]
        srcs += [np.arange(n) + off, np.arange(m) + off + n]
        off += n + m
        if q:
            targets += [self.h_diag_idx]
            srcs += [np.arange(q) + off]
        self._gather = _gather_plan(
            np.concatenate([np.asarray(t).reshape(-1) for t in targets]),
            np.concatenate(srcs), garbage, self.T_size)
        self._n_init_ones = len(self.init_idx)

    def assemble(self, H_i, Jg_i, Jh_i, sig_w_delta, g_diag, h_diag):
        """Build (D, U, Lo, Bord, Root) tensors from instance tensors by
        gather+sum (see _gather_plan)."""
        C, S, b, R = self.C, self.S, self.b, self.R
        dtype = H_i.dtype
        V = jnp.concatenate([
            H_i.reshape(-1), Jg_i.reshape(-1), Jh_i.reshape(-1),
            jnp.ones((self._n_init_ones,), dtype),
            jnp.asarray(sig_w_delta, dtype),
            jnp.asarray(g_diag, dtype)]
            + ([jnp.asarray(h_diag, dtype)] if self.q else [])
            + [jnp.zeros((1,), dtype)])
        T = _gather_apply(self._gather, V)
        T = jnp.concatenate([T, jnp.zeros((1,), dtype)])

        bs = self._band_sz
        D = T[:bs].reshape(C, S, b, b)
        U = T[bs:2 * bs].reshape(C, S, b, b)
        Lo = T[2 * bs:3 * bs].reshape(C, S, b, b)
        Bord = T[self._bord_off:self._root_off].reshape(C, S, b, R)
        Root = T[self._root_off:self._root_off + R * R].reshape(R, R)
        tr = b - 1
        D = D.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0) \
             .at[:, :, tr, tr].set(1.0)
        U = U.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0)
        Lo = Lo.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0)
        if R:
            Bord = Bord.at[:, :, tr, :].set(0.0)
        D = D + jax.vmap(jax.vmap(jnp.diag))(
            jnp.asarray(self.pad_diag, D.dtype))
        # U slot k: (stage k rows, stage k+1 cols); Lo slot k: (stage k+1
        # rows, stage k cols) -- slots 0..S-2
        return D, U[:, :-1], Lo[:, :-1], Bord, Root

    def pack_rhs(self, r_w, r_g, r_h):
        vec = jnp.zeros((self.vec_size,), r_w.dtype)
        vec = vec.at[jnp.asarray(self.w_pos)].set(r_w)
        vec = vec.at[jnp.asarray(self.g_pos)].set(r_g)
        if self.q:
            vec = vec.at[jnp.asarray(self.h_pos)].set(r_h)
        csb = self.C * self.S * self.b
        return (vec[:csb].reshape(self.C, self.S, self.b), vec[csb:])

    def unpack_sol(self, x_c, x_r):
        flat = jnp.concatenate([x_c.reshape(-1), x_r])
        dw = flat[jnp.asarray(self.w_pos)]
        dg = flat[jnp.asarray(self.g_pos)]
        dh = flat[jnp.asarray(self.h_pos)] if self.q \
            else jnp.zeros((0,), x_c.dtype)
        return dw, dg, dh


class CondensedAssembler:
    """Entity-pair scatter for the *condensed* BBD system.

    Stage condensation: the per-instance collocation interior — collocation
    states/algebraic variables and their residual rows, which no other
    instance references — is Schur-eliminated by batched dense solves
    BEFORE band assembly, so the band block size b drops from
    O(n_coll·n_x + …) to O(n_x + n_u), cutting the sequential sweep's
    flops ~20x (profiled: the sweep was 75% of a TPU IPM iteration).  This
    is the classic condensed/Riccati OCP factorization (the reference
    leaves the same elimination to IPOPT's general sparse solver,
    do_mpc/optimizer.py:731-787).

    Unlike :class:`BBDAssembler` (which scatters H/Jg/Jh separately and
    allows only diagonal lam-lam terms), the condensed per-instance block
    ``C_i`` is a full symmetric matrix over *boundary entities* — boundary
    variables, boundary equality rows, inequality rows — because the Schur
    complement fills lam-lam couplings.  This assembler maps each entity to
    a (chain, stage, slot) and scatters the whole (n_ent, n_ent) block.

    Parameters mirror BBDAssembler, plus:
      B_cols   (I, n_bv) global column ids of boundary vars (>= n dropped)
      B_grows  (I, n_br) global eq-row ids of boundary rows
      skip_var (n,) bool: interior vars (get no slot)
      skip_g   (m,) bool: interior eq rows (get no slot)
    """

    def __init__(self, var_chain, var_stage, g_chain, g_stage,
                 h_chain, h_stage, B_cols, B_grows, R_h, n, m, q,
                 init_cols, skip_var, skip_g):
        var_chain = np.asarray(var_chain, int)
        var_stage = np.asarray(var_stage, int)
        g_chain = np.asarray(g_chain, int)
        g_stage = np.asarray(g_stage, int)
        h_chain = np.asarray(h_chain, int)
        h_stage = np.asarray(h_stage, int)
        skip_var = np.asarray(skip_var, bool)
        skip_g = np.asarray(skip_g, bool)
        self.n, self.m, self.q = n, m, q
        I = B_cols.shape[0]
        nlr = R_h.shape[1]

        C = int(max(var_chain[~skip_var].max(initial=-1),
                    g_chain[~skip_g].max(initial=-1),
                    h_chain.max(initial=-1))) + 1
        C = max(C, 1)
        live_v = (~skip_var) & (var_chain >= 0)
        live_g = (~skip_g) & (g_chain >= 0)
        S = 1 + int(max(var_stage[live_v].max(initial=0),
                        g_stage[live_g].max(initial=0),
                        h_stage[h_chain >= 0].max(initial=0)))
        self.C, self.S = C, S

        # ---- slot assignment over live entities ------------------------
        w_loc = np.zeros(n, int)
        g_loc = np.zeros(m, int)
        h_loc = np.zeros(max(q, 1), int)[:q]
        sizes = np.zeros((C, S), int)
        root_count = 0
        for arr_chain, arr_stage, arr_loc, skip in (
                (var_chain, var_stage, w_loc, skip_var),
                (g_chain, g_stage, g_loc, skip_g),
                (h_chain, h_stage, h_loc, np.zeros(q, bool))):
            for c in range(C):
                for k in range(S):
                    sel = np.nonzero((arr_chain == c) & (arr_stage == k)
                                     & ~skip)[0]
                    arr_loc[sel] = sizes[c, k] + np.arange(len(sel))
                    sizes[c, k] += len(sel)
            sel = np.nonzero((arr_chain == ROOT) & ~skip)[0]
            arr_loc[sel] = root_count + np.arange(len(sel))
            root_count += len(sel)
        R = root_count
        self.R = R
        b = int(sizes.max()) + 1
        self.b = b

        band_sz = C * S * b * b
        bord_sz = C * S * b * R
        self.T_size = 3 * band_sz + bord_sz + R * R + 1
        garbage = self.T_size - 1
        bord_off = 3 * band_sz
        root_off = bord_off + bord_sz
        self._band_sz = band_sz
        self._bord_off = bord_off
        self._root_off = root_off

        def flat_band(band, chain, stage, r, c):
            return (band * band_sz + ((chain * S + stage) * b + r) * b + c)

        def pair_idx(r_ch, r_st, r_lc, c_ch, c_st, c_lc):
            r_ch, r_st, r_lc, c_ch, c_st, c_lc = np.broadcast_arrays(
                r_ch, r_st, r_lc, c_ch, c_st, c_lc)
            out = np.full(r_ch.shape, garbage, dtype=np.int64)
            both = (r_ch >= 0) & (c_ch == r_ch)
            ds = c_st - r_st
            sel = both & (ds == 0)
            out[sel] = flat_band(0, r_ch[sel], r_st[sel], r_lc[sel],
                                 c_lc[sel])
            sel = both & (ds == 1)
            out[sel] = flat_band(1, r_ch[sel], r_st[sel], r_lc[sel],
                                 c_lc[sel])
            sel = both & (ds == -1)
            out[sel] = flat_band(2, r_ch[sel],
                                 np.maximum(r_st[sel] - 1, 0), r_lc[sel],
                                 c_lc[sel])
            sel = (r_ch >= 0) & (c_ch == ROOT)
            out[sel] = (bord_off + ((r_ch[sel] * S + r_st[sel]) * b
                                    + r_lc[sel]) * R + c_lc[sel])
            sel = (r_ch == ROOT) & (c_ch == ROOT)
            out[sel] = root_off + r_lc[sel] * R + c_lc[sel]
            return out

        # ---- per-entity (chain, stage, loc) triples ---------------------
        PARAM_CH = PARAM
        zcol = np.minimum(B_cols, n - 1)
        vc = np.where((B_cols < n) & ~skip_var[zcol], var_chain[zcol],
                      PARAM_CH)
        vs = np.where(B_cols < n, var_stage[zcol], 0)
        vl = np.where(B_cols < n, w_loc[zcol], 0)
        gc_ = g_chain[B_grows]
        gs_ = g_stage[B_grows]
        gl_ = g_loc[B_grows]
        if nlr:
            hc_ = h_chain[R_h]
            hs_ = h_stage[R_h]
            hl_ = h_loc[R_h]
            ent_ch = np.concatenate([vc, gc_, hc_], axis=1)
            ent_st = np.concatenate([vs, gs_, hs_], axis=1)
            ent_lc = np.concatenate([vl, gl_, hl_], axis=1)
        else:
            ent_ch = np.concatenate([vc, gc_], axis=1)
            ent_st = np.concatenate([vs, gs_], axis=1)
            ent_lc = np.concatenate([vl, gl_], axis=1)
        self.n_ent = ent_ch.shape[1]
        self.ent_pair_idx = pair_idx(
            ent_ch[:, :, None], ent_st[:, :, None], ent_lc[:, :, None],
            ent_ch[:, None, :], ent_st[:, None, :],
            ent_lc[:, None, :]).astype(np.int64)

        # global diagonals (sig_w + delta on live vars; skipped vars ->
        # garbage so the caller can pass full-length vectors)
        vch_all = np.where(skip_var, PARAM_CH, var_chain)
        self.w_diag_idx = pair_idx(vch_all, var_stage, w_loc,
                                   vch_all, var_stage, w_loc)
        if init_cols is not None and len(init_cols):
            nx0 = len(init_cols)
            ic = np.asarray(init_cols, int)
            self.init_idx = np.concatenate([
                pair_idx(g_chain[:nx0], g_stage[:nx0], g_loc[:nx0],
                         var_chain[ic], var_stage[ic], w_loc[ic]),
                pair_idx(var_chain[ic], var_stage[ic], w_loc[ic],
                         g_chain[:nx0], g_stage[:nx0], g_loc[:nx0])])
            # the init rows belong to no instance: their own -delta_cons
            # diagonal is scattered separately
            self.g_diag_init_idx = pair_idx(
                g_chain[:nx0], g_stage[:nx0], g_loc[:nx0],
                g_chain[:nx0], g_stage[:nx0], g_loc[:nx0])
        else:
            self.init_idx = np.zeros((0,), np.int64)
            self.g_diag_init_idx = np.zeros((0,), np.int64)

        # rhs scatter / solution gather (flat = [chain, root, trash])
        def pos(ch, st, lc, skip):
            chain_flat = (ch * S + st) * b + lc
            out = np.where(ch >= 0, chain_flat, C * S * b + lc)
            return np.where(skip | (ch == PARAM_CH), C * S * b + R, out)

        self.w_pos = pos(var_chain, var_stage, w_loc,
                         skip_var).astype(np.int64)
        self.g_pos = pos(g_chain, g_stage, g_loc, skip_g).astype(np.int64)
        self.h_pos = pos(h_chain, h_stage, h_loc,
                         np.zeros(q, bool)).astype(np.int64)
        self.ent_pos = pos(ent_ch, ent_st, ent_lc,
                           ent_ch == PARAM_CH).astype(np.int64)
        self.vec_size = C * S * b + R + 1   # + trash

        pad = np.zeros((C, S, b))
        for c in range(C):
            for k in range(S):
                pad[c, k, sizes[c, k]:b - 1] = 1.0
        self.pad_diag = pad
        mask = np.zeros(self.vec_size)
        mask[self.w_pos[~skip_var]] = 1.0
        mask[-1] = 0.0
        self.w_mask_chain = mask[:C * S * b].reshape(C, S, b)
        self.w_mask_root = mask[C * S * b:C * S * b + R]

        # gather-form assembly plan (see _gather_plan): sources laid out
        # as [C_i.flat | sig_w_delta | ones(init) | g_diag_init | 0-pad]
        targets = np.concatenate([
            self.ent_pair_idx.reshape(-1), self.w_diag_idx,
            self.init_idx, self.g_diag_init_idx])
        self._n_init_ones = len(self.init_idx)
        self._gather = _gather_plan(
            targets, np.arange(targets.shape[0]), garbage, self.T_size)

    def assemble(self, C_i, sig_w_delta, g_diag_init):
        """Assemble condensed per-instance blocks into (D, U, Lo, Bord,
        Root).  Default backend is two-tier gather+sum (see _gather_plan);
        ``DOMPC_TPU_ASSEMBLE=scatter`` selects the scatter-add form for
        A/B timing.  NOTE: the env var is read at TRACE time — set it
        before the first jitted solve; flipping it after compilation has
        no effect on already-compiled programs.
        ``C_i``: (I, n_ent, n_ent) symmetric condensed
        blocks; ``sig_w_delta``: (n,) diagonal for live vars
        (garbage-dropped on skipped/interior); ``g_diag_init``: (n_x0,)
        diagonal for the initial-condition identity rows."""
        import os as _os
        C, S, b, R = self.C, self.S, self.b, self.R
        dtype = C_i.dtype
        if _os.environ.get("DOMPC_TPU_ASSEMBLE") == "scatter":
            T = jnp.zeros((self.T_size,), dtype)
            T = T.at[jnp.asarray(self.ent_pair_idx).reshape(-1)].add(
                C_i.reshape(-1))
            T = T.at[jnp.asarray(self.w_diag_idx)].add(sig_w_delta)
            T = T.at[jnp.asarray(self.init_idx)].add(1.0)
            T = T.at[jnp.asarray(self.g_diag_init_idx)].add(g_diag_init)
        else:
            V = jnp.concatenate([
                C_i.reshape(-1), jnp.asarray(sig_w_delta, dtype),
                jnp.ones((self._n_init_ones,), dtype),
                jnp.asarray(g_diag_init, dtype).reshape(-1),
                jnp.zeros((1,), dtype)])
            T = _gather_apply(self._gather, V)
            T = jnp.concatenate([T, jnp.zeros((1,), dtype)])
        bs = self._band_sz
        D = T[:bs].reshape(C, S, b, b)
        U = T[bs:2 * bs].reshape(C, S, b, b)
        Lo = T[2 * bs:3 * bs].reshape(C, S, b, b)
        Bord = T[self._bord_off:self._root_off].reshape(C, S, b, R)
        Root = T[self._root_off:self._root_off + R * R].reshape(R, R)
        tr = b - 1
        D = D.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0) \
             .at[:, :, tr, tr].set(1.0)
        U = U.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0)
        Lo = Lo.at[:, :, tr, :].set(0.0).at[:, :, :, tr].set(0.0)
        if R:
            Bord = Bord.at[:, :, tr, :].set(0.0)
        D = D + jax.vmap(jax.vmap(jnp.diag))(
            jnp.asarray(self.pad_diag, D.dtype))
        return D, U[:, :-1], Lo[:, :-1], Bord, Root

    def pack_rhs(self, b_w, b_g, b_h):
        vec = jnp.zeros((self.vec_size,), b_w.dtype)
        vec = vec.at[jnp.asarray(self.w_pos)].set(b_w)
        vec = vec.at[jnp.asarray(self.g_pos)].set(b_g)
        if self.q:
            vec = vec.at[jnp.asarray(self.h_pos)].set(b_h)
        vec = vec.at[-1].set(0.0)
        csb = self.C * self.S * self.b
        return (vec[:csb].reshape(self.C, self.S, self.b),
                vec[csb:csb + self.R])

    def add_corrections(self, rhs_c, rhs_r, corr):
        """Scatter-SUBTRACT per-instance boundary corrections
        (Schur rhs term M_bi M_ii^{-1} b_int); corr: (I, n_ent)."""
        csb = self.C * self.S * self.b
        vec = jnp.zeros((self.vec_size,), corr.dtype)
        vec = vec.at[jnp.asarray(self.ent_pos).reshape(-1)].add(
            corr.reshape(-1))
        return (rhs_c - vec[:csb].reshape(self.C, self.S, self.b),
                rhs_r - vec[csb:csb + self.R])

    def unpack_sol(self, x_c, x_r):
        flat = jnp.concatenate([x_c.reshape(-1), x_r,
                                jnp.zeros((1,), x_c.dtype)])
        dw = flat[jnp.asarray(self.w_pos)]
        dg = flat[jnp.asarray(self.g_pos)]
        dh = flat[jnp.asarray(self.h_pos)] if self.q \
            else jnp.zeros((0,), x_c.dtype)
        x_ent = flat[jnp.asarray(self.ent_pos)]
        return dw, dg, dh, x_ent


def band_solve_qr_multi(D, U, Lo, rhs):
    """Pivot-free block-tridiagonal solve with multiple right-hand sides.

    Sequential block-QR elimination (banded QR, Golub/Van Loan): at each
    stage one R-only QR of the augmented (2b, 3b+t) panel eliminates the
    sub-diagonal block; the trailing reflections recombine only
    not-yet-finalized rows, so the system is preserved.  Orthogonal
    elimination has bounded growth -- the float32-stable TPU path.

    D: (S, b, b); U, Lo: (S-1, b, b); rhs: (S, b, t).  Returns (S, b, t).
    """
    S, b, t = rhs.shape
    solve_tri = jax.scipy.linalg.solve_triangular

    def step(carry, inp):
        Dhat, Uhat, rhat = carry
        L_k, D_n, U_n, r_n = inp
        M = jnp.concatenate([
            jnp.concatenate([Dhat, Uhat, jnp.zeros((b, b), Dhat.dtype),
                             rhat], axis=1),
            jnp.concatenate([L_k, D_n, U_n, r_n], axis=1)], axis=0)
        Rm = jnp.linalg.qr(M, mode="r")                    # (2b, 3b+t)
        R_k = Rm[:b, :b]
        B_k = Rm[:b, b:2 * b]
        C_k = Rm[:b, 2 * b:3 * b]
        c_k = Rm[:b, 3 * b:]
        return (Rm[b:, b:2 * b], Rm[b:, 2 * b:3 * b], Rm[b:, 3 * b:]), \
            (R_k, B_k, C_k, c_k)

    zero = jnp.zeros((b, b), rhs.dtype)
    init = (D[0], U[0] if S > 1 else zero, rhs[0])
    if S > 1:
        U_ext = jnp.concatenate([U[1:], zero[None]], axis=0) \
            if S > 2 else zero[None]
        (Dh, Uh, rh), (Rs, Bs, Cs, cs) = jax.lax.scan(
            step, init, (Lo, D[1:], U_ext, rhs[1:]))
    else:
        Dh, Uh, rh = init

    Rf = jnp.linalg.qr(jnp.concatenate([Dh, rh], axis=1), mode="r")
    x_last = solve_tri(Rf[:b, :b], Rf[:b, b:], lower=False)

    if S == 1:
        return x_last[None]

    def bwd(carry, inp):
        x_next, x_next2 = carry
        R_k, B_k, C_k, c_k = inp
        x_k = solve_tri(R_k, c_k - B_k @ x_next - C_k @ x_next2,
                        lower=False)
        return (x_k, x_next), x_k

    (x0_, _), xs_rev = jax.lax.scan(
        bwd, (x_last, jnp.zeros((b, t), rhs.dtype)),
        (Rs[::-1], Bs[::-1], Cs[::-1], cs[::-1]))
    return jnp.concatenate([xs_rev[::-1], x_last[None]], axis=0)


def bbd_matvec(D, U, Lo, Bord, Root, x_c, x_r):
    """Apply the full BBD operator; x_c (C,S,b), x_r (R,)."""
    y = jnp.einsum("ckij,ckj->cki", D, x_c)
    y = y.at[:, :-1].add(jnp.einsum("ckij,ckj->cki", U, x_c[:, 1:]))
    y = y.at[:, 1:].add(jnp.einsum("ckij,ckj->cki", Lo, x_c[:, :-1]))
    R = Root.shape[0]
    if R:
        y = y + jnp.einsum("ckir,r->cki", Bord, x_r)
        y_r = Root @ x_r + jnp.einsum("ckir,cki->r", Bord, x_c)
    else:
        y_r = jnp.zeros((0,), x_c.dtype)
    return y, y_r


def bbd_solve(D, U, Lo, Bord, Root, rhs_c, rhs_r, n_refine=0,
              accel=False):
    """Solve the bordered-block-diagonal system.

    One batched multi-RHS QR sweep per chain computes A_c^{-1}[B_c, r_c];
    the root is then eliminated by a small dense Schur-complement solve.
    Optional iterative refinement re-runs the sweep on the residual
    (useful for float64 golden-accuracy runs; float32 TPU runs rely on the
    IPM's inexact-Newton acceptance instead).

    ``accel=True`` selects the accelerator sweep backend, by default the
    batch-in-lanes XLA formulation (solver/batchqr.py) — profiled fastest
    at the condensed block size b~13 (8.8 ms vs the fused Pallas kernel's
    69 ms at B=128, BENCH.md).  The experimental Pallas VMEM kernel
    (solver/pallas_band.py, competitive at larger b) is reachable via
    ``DOMPC_TPU_BAND_BACKEND=pallas`` (read at trace time, f32 only).
    """
    C, S, b, R = Bord.shape
    # accelerator backends: 'lanes' = batch-in-lanes XLA sweep (default —
    # an outer vmap flattens into the lane batch via its custom-vmap rule,
    # profiled fastest at b ~ 13), 'pallas' = fused VMEM kernel (best at
    # larger b), 'scan' = per-chain XLA QR panels (CPU/f64 reference).
    import os as _os
    env_choice = _os.environ.get("DOMPC_TPU_BAND_BACKEND", "")
    # accelerator default: the lanes-layout Pallas kernel (in-loop A/B at
    # B=128 on the flagship: warm 1367 vs 1288 solves/s, RTI 1812 vs
    # 1738, cold 208 vs 189 — the VMEM-resident panel beats the XLA
    # sweep's per-column HBM round trips); 'lanes' remains one env var
    # away
    choice = env_choice or ("pallas" if accel else "scan")
    if choice in ("pallas", "pallas_tiled") and D.dtype != jnp.float32:
        # the fused VMEM kernels are f32-only; fall back to the lanes
        # sweep so the backend pairing stays consistent (warn only for an
        # explicit request — the implicit accel default falls back
        # silently, e.g. f64 debugging runs on TPU)
        if env_choice:
            import warnings as _warnings
            _warnings.warn(
                f"DOMPC_TPU_BAND_BACKEND={choice} requires float32 "
                f"inputs (got {D.dtype}); using the 'lanes' sweep.")
        choice = "lanes"
    if choice == "pallas":
        # per-stage VMEM working set must fit (stage factors stream
        # through HBM, so this only excludes absurd block sizes)
        from .pallas_band import pallas_lanes_fits
        t_cols = R + 1
        if not pallas_lanes_fits(S, b, t_cols):
            import warnings as _warnings
            _warnings.warn(
                f"pallas lanes sweep working set too large for VMEM "
                f"(S={S}, b={b}, t={t_cols}); using the 'lanes' sweep.")
            choice = "lanes"

    # Partitioned (SPIKE-QR) sweep: the sequential sweep is depth-bound
    # (S stages x b Householder columns); partitioning trades depth for
    # extra lane batch (solver/batchqr.py:band_solve_spike_impl).
    # Heuristic: ~6-stage segments once chains are long enough.
    # DOMPC_TPU_SPIKE=0 disables, an integer forces the partition count
    # (read at trace time).
    # Measured trade-off: the partition carries 2b extra RHS columns
    # through every panel, so on bandwidth-bound medium chains it LOSES
    # (flagship S=21: 1022 vs 1304 warm solves/s at B=128), while on
    # depth-bound long chains it WINS big (DIP S=101 per-step latency
    # 35.6 s -> 12.0 s, 3.0x, at P=13).  Default: on for S >= 48 with
    # ~7-stage segments; DOMPC_TPU_SPIKE=<P> forces a partition count,
    # =0 disables (read at trace time).
    spike_env = _os.environ.get("DOMPC_TPU_SPIKE", "")
    if spike_env:
        n_parts = int(spike_env)
    elif D.dtype == jnp.float32:
        # SPIKE is f64-only by default (r5): on the CONVERGENT DIP path
        # the partitioned sweep's f32 solves stall the whole IPM at KKT
        # err ~2e-2 (300 maxed iterations, every step) while the plain
        # lanes sweep certifies at 1e-4 in 13-16 warm iterations — the
        # separator reduction's extra 2b coupling columns lose too much
        # precision at f32.  (The r3 "3x latency win" was measured on a
        # solve that never converged, so the accuracy cost was
        # invisible.)  DOMPC_TPU_SPIKE=<P> still forces it on, and
        # DOMPC_TPU_SPIKE_F32_REFINE=<k> tunes the default below: the
        # auto heuristic re-enabled with k whole-system iterative-
        # refinement passes (the residual re-solve at the bottom) claws
        # the lost precision back — each pass costs one more
        # partitioned sweep, so it wins while (1 + k) * spike_sweep <
        # plain_sweep.  Measured on DIP S=101 (r5): k=1 certifies most
        # steps then intermittently diverges (kkt 5.4 on 2 of 5); k=2
        # certifies every step at 12 iterations and 431 ms/step vs the
        # plain lanes sweep's 626 ms — the f32 long-chain default.
        # k=0 restores the plain sweep.
        sp_ref = int(_os.environ.get("DOMPC_TPU_SPIKE_F32_REFINE", "2"))
        n_parts = (max(2, round((S + 1) / 8))
                   if (sp_ref and S >= 48) else 0)
        if n_parts:
            n_refine = max(n_refine, sp_ref)
    else:
        n_parts = max(2, round((S + 1) / 8)) if S >= 48 else 0
    if n_parts < 2 or S < 2 * n_parts - 1 or choice == "lanes_wy":
        # invalid/forced-off partition counts fall back to the plain
        # sweep, and the lanes_wy A/B knob must actually measure the WY
        # variant rather than being silently overridden by SPIKE
        n_parts = 0
    if choice == "pallas":
        # Long chains drop to the XLA lanes sweep, both unpartitioned
        # (Mosaic reproducibly SIGABRTs compiling the streaming kernel
        # at DIP's S=101; fine at S=21) and inside SPIKE segments
        # (pallas-inner SPIKE measured kkt ~9.5 divergence on DIP where
        # lanes-inner certifies at 431 ms/step — r5).
        # DOMPC_TPU_PALLAS_SMAX raises/lowers the cutoff.
        s_max = int(_os.environ.get("DOMPC_TPU_PALLAS_SMAX", "48"))
        if S > s_max and not env_choice:
            choice = "lanes"

    def one_solve(rc, rr):
        aug = jnp.concatenate([Bord, rc[..., None]], axis=-1) if R \
            else rc[..., None]
        if choice == "pallas" and not n_parts:
            from .pallas_band import band_solve_pallas
            Y = band_solve_pallas(D, U, Lo, aug)          # (C,S,b,R+1)
        elif choice == "pallas_tiled":
            from .pallas_band import band_solve_qr_pallas
            Y = band_solve_qr_pallas(D, U, Lo, aug)
        elif choice in ("lanes", "lanes_wy", "pallas"):
            if n_parts:
                from .batchqr import band_solve_spike
                Y = band_solve_spike(D, U, Lo, aug, n_parts=n_parts,
                                     use_pallas=choice == "pallas")
            else:
                from .batchqr import band_solve, band_solve_wy
                Y = (band_solve_wy(D, U, Lo, aug)
                     if choice == "lanes_wy" else
                     band_solve(D, U, Lo, aug))
        else:
            Y = jax.vmap(band_solve_qr_multi)(D, U, Lo, aug)
        if not R:
            return Y[..., 0], jnp.zeros((0,), rc.dtype)
        BtY = jnp.einsum("ckir,ckit->rt", Bord, Y)         # (R, R+1)
        S_r = Root - BtY[:, :R]
        s_rhs = rr - BtY[:, R]
        if choice in ("lanes", "lanes_wy", "pallas", "pallas_tiled"):
            # batched tiny root solves: pivoted LU serializes on TPU;
            # the batch-in-lanes Householder QR flattens the outer vmap
            # batch into lanes instead (same accelerator argument as the
            # interior condensation solves, solver/batchqr.py)
            from .batchqr import qr_solve
            x_r = qr_solve(S_r[None], s_rhs[None, :, None])[0, :, 0]
        else:
            x_r = jnp.linalg.solve(S_r, s_rhs)
        x_c = Y[..., R] - jnp.einsum("ckit,t->cki", Y[..., :R], x_r)
        return x_c, x_r

    x_c, x_r = one_solve(rhs_c, rhs_r)
    for _ in range(n_refine):
        y_c, y_r = bbd_matvec(D, U, Lo, Bord, Root, x_c, x_r)
        e_c, e_r = one_solve(rhs_c - y_c, rhs_r - y_r)
        x_c = x_c + e_c
        x_r = x_r + e_r
    return x_c, x_r
