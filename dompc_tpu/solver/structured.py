"""Direct block-band assembly of the OCP KKT system.

This is the performance core of the framework: the reference hands its
sparse NLP to IPOPT + MUMPS/MA27 (do_mpc/optimizer.py:731-787); here the
stage-block-tridiagonal KKT system is *assembled directly* from
instance-local derivative tensors (no global sparse or dense matrix ever
materializes) and factorized by a block-LU sweep over stages:

  * per-(stage,scenario,branch) instance: small dense Hessian/Jacobian
    blocks from vmapped autodiff,
  * scatter-add into band tensors D (diag), U (super), L (sub) of shape
    (S, b, b) via precomputed static index maps,
  * sequential block LU over S stages (lax.scan), O(S * b^3),
  * one iterative-refinement pass using the exact band matvec.

Everything is static-shape and vmaps over problem instances, so thousands
of NMPC solves batch into (B, S, b, b) tensors — dense b x b matmuls on the
MXU.  Scenario trees need no special casing (stage grouping keeps coupling
adjacent-stage only).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class BlockAssembler:
    """Precomputes static scatter maps from instance-local tensors into the
    stage-band KKT representation."""

    def __init__(self, w_stage, g_stage, h_stage, inst_stage, A_all,
                 R_g, R_h, n, m, q, init_cols):
        w_stage = np.asarray(w_stage, int)
        g_stage = np.asarray(g_stage, int)
        h_stage = np.asarray(h_stage, int)
        inst_stage = np.asarray(inst_stage, int)
        S = int(max(w_stage.max(initial=0), g_stage.max(initial=0),
                    h_stage.max(initial=0))) + 1
        self.S = S
        self.n, self.m, self.q = n, m, q
        I, d = A_all.shape
        E = R_g.shape[1]
        nlr = R_h.shape[1] if q else 0

        # local positions: rows of stage k are ordered [w_k, lam_g_k, lam_h_k]
        w_loc = np.zeros(n, int)
        g_loc = np.zeros(m, int)
        h_loc = np.zeros(q, int)
        sizes = np.zeros(S, int)
        for k in range(S):
            c = 0
            wi = np.nonzero(w_stage == k)[0]
            w_loc[wi] = np.arange(len(wi))
            c += len(wi)
            gi = np.nonzero(g_stage == k)[0]
            g_loc[gi] = c + np.arange(len(gi))
            c += len(gi)
            hi = np.nonzero(h_stage == k)[0]
            h_loc[hi] = c + np.arange(len(hi))
            c += len(hi)
            sizes[k] = c
        b = int(sizes.max()) + 1          # last slot = trash
        self.b = b
        tr = b - 1

        # column maps for the extended instance vector (cols >= n: params)
        col_stage = np.where(A_all < n, w_stage[np.minimum(A_all, n - 1)],
                             inst_stage[:, None])
        col_loc = np.where(A_all < n, w_loc[np.minimum(A_all, n - 1)], tr)

        band_sz = S * b * b
        self.T_size = 3 * band_sz + 1
        garbage = self.T_size - 1

        def flat_idx(band, slot, r, c):
            return band * band_sz + (slot * b + r) * b + c

        def pair_idx(r_stage, r_loc, c_stage, c_loc):
            """Map (row, col) global position to flat band index."""
            ds = c_stage - r_stage
            same = flat_idx(0, r_stage, r_loc, c_loc)
            up = flat_idx(1, r_stage, r_loc, c_loc)
            dn = flat_idx(2, np.maximum(r_stage - 1, 0), r_loc, c_loc)
            out = np.where(ds == 0, same,
                           np.where(ds == 1, up,
                                    np.where(ds == -1, dn, garbage)))
            return out

        # Hessian scatter: (I, d, d)
        self.h_idx = pair_idx(
            col_stage[:, :, None], col_loc[:, :, None],
            col_stage[:, None, :], col_loc[:, None, :]).astype(np.int32)

        # Jacobian scatter (both the (lam,w) and symmetric (w,lam) entries)
        g_row_stage = g_stage[R_g]            # (I, E)
        g_row_loc = g_loc[R_g]
        self.jg_idx = pair_idx(
            g_row_stage[:, :, None], g_row_loc[:, :, None],
            col_stage[:, None, :], col_loc[:, None, :]).astype(np.int32)
        self.jg_idx_T = pair_idx(
            col_stage[:, None, :], col_loc[:, None, :],
            g_row_stage[:, :, None], g_row_loc[:, :, None]).astype(np.int32)
        if q:
            h_row_stage = h_stage[R_h]
            h_row_loc = h_loc[R_h]
            self.jh_idx = pair_idx(
                h_row_stage[:, :, None], h_row_loc[:, :, None],
                col_stage[:, None, :], col_loc[:, None, :]).astype(np.int32)
            self.jh_idx_T = pair_idx(
                col_stage[:, None, :], col_loc[:, None, :],
                h_row_stage[:, :, None], h_row_loc[:, :, None]).astype(
                np.int32)
        else:
            self.jh_idx = self.jh_idx_T = np.zeros((I, 0, d), np.int32)

        # diagonal entries
        self.w_diag_idx = flat_idx(0, w_stage, w_loc, w_loc).astype(np.int32)
        self.g_diag_idx = flat_idx(0, g_stage, g_loc, g_loc).astype(np.int32)
        self.h_diag_idx = flat_idx(0, h_stage, h_loc, h_loc).astype(np.int32)

        # initial-condition rows: identity between the first nx equality
        # rows and the given columns
        nx0 = len(init_cols)
        r_st, r_lc = g_stage[:nx0], g_loc[:nx0]
        c_st, c_lc = w_stage[init_cols], w_loc[init_cols]
        self.init_idx = np.concatenate([
            pair_idx(r_st, r_lc, c_st, c_lc),
            pair_idx(c_st, c_lc, r_st, r_lc)]).astype(np.int32)

        # rhs scatter / solution gather positions (within (S, b))
        self.w_pos = (w_stage * b + w_loc).astype(np.int32)
        self.g_pos = (g_stage * b + g_loc).astype(np.int32)
        self.h_pos = (h_stage * b + h_loc).astype(np.int32)
        # unused padding slots (between the real block size and the trash
        # slot) need identity diagonal entries
        pad_diag = np.zeros((S, b))
        for k in range(S):
            pad_diag[k, sizes[k]:b - 1] = 1.0
        self.pad_diag = pad_diag

    def assemble(self, H_i, Jg_i, Jh_i, sig_w_delta, g_diag, h_diag):
        """Build (D, U, L) band tensors from instance tensors.

        H_i: (I, d, d); Jg_i: (I, E, d); Jh_i: (I, nlr, d);
        sig_w_delta: (n,) diagonal for w rows; g_diag: (m,); h_diag: (q,).
        """
        S, b = self.S, self.b
        T = jnp.zeros((self.T_size,), H_i.dtype)
        T = T.at[jnp.asarray(self.h_idx).reshape(-1)].add(H_i.reshape(-1))
        T = T.at[jnp.asarray(self.jg_idx).reshape(-1)].add(Jg_i.reshape(-1))
        T = T.at[jnp.asarray(self.jg_idx_T).reshape(-1)].add(
            Jg_i.reshape(-1))
        if self.q:
            T = T.at[jnp.asarray(self.jh_idx).reshape(-1)].add(
                Jh_i.reshape(-1))
            T = T.at[jnp.asarray(self.jh_idx_T).reshape(-1)].add(
                Jh_i.reshape(-1))
        T = T.at[jnp.asarray(self.init_idx)].add(1.0)
        T = T.at[jnp.asarray(self.w_diag_idx)].add(sig_w_delta)
        T = T.at[jnp.asarray(self.g_diag_idx)].add(g_diag)
        if self.q:
            T = T.at[jnp.asarray(self.h_diag_idx)].add(h_diag)

        band_sz = S * b * b
        D = T[:band_sz].reshape(S, b, b)
        U = T[band_sz:2 * band_sz].reshape(S, b, b)
        Lo = T[2 * band_sz:3 * band_sz].reshape(S, b, b)
        tr = b - 1
        # scrub trash row/col and pin its diagonal
        D = D.at[:, tr, :].set(0.0).at[:, :, tr].set(0.0) \
             .at[:, tr, tr].set(1.0)
        U = U.at[:, tr, :].set(0.0).at[:, :, tr].set(0.0)
        Lo = Lo.at[:, tr, :].set(0.0).at[:, :, tr].set(0.0)
        # identity diagonal on unused padding slots
        D = D + jax.vmap(jnp.diag)(jnp.asarray(self.pad_diag, D.dtype))
        # U slot k holds (stage k rows, stage k+1 cols); L slot k holds
        # (stage k+1 rows, stage k cols) — both use slots 0..S-2
        return D, U[:-1], Lo[:-1]

    def pack_rhs(self, r_w, r_g, r_h):
        S, b = self.S, self.b
        rhs = jnp.zeros((S * b,), r_w.dtype)
        rhs = rhs.at[jnp.asarray(self.w_pos)].set(r_w)
        rhs = rhs.at[jnp.asarray(self.g_pos)].set(r_g)
        if self.q:
            rhs = rhs.at[jnp.asarray(self.h_pos)].set(r_h)
        return rhs.reshape(S, b)

    def unpack_sol(self, x):
        flat = x.reshape(-1)
        dw = flat[jnp.asarray(self.w_pos)]
        dg = flat[jnp.asarray(self.g_pos)]
        dh = flat[jnp.asarray(self.h_pos)] if self.q \
            else jnp.zeros((0,), x.dtype)
        return dw, dg, dh


def band_matvec(D, U, Lo, x):
    """(S,b) result of the block-tridiagonal operator applied to x (S,b)."""
    y = jnp.einsum("kij,kj->ki", D, x)
    y = y.at[:-1].add(jnp.einsum("kij,kj->ki", U, x[1:]))
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", Lo, x[:-1]))
    return y


def band_factor(D, U, Lo):
    """Sequential block-LU: returns LU factors of the Schur diagonal blocks."""
    lu_factor = jax.scipy.linalg.lu_factor
    lu_solve = jax.scipy.linalg.lu_solve

    def fwd(lu_prev, inp):
        D_k, L_km1, U_km1 = inp
        X = lu_solve(lu_prev, U_km1)
        lu_k = lu_factor(D_k - L_km1 @ X)
        return lu_k, lu_k

    lu0 = lu_factor(D[0])
    _, lu_tail = jax.lax.scan(fwd, lu0, (D[1:], Lo, U))
    return jax.tree.map(
        lambda a, t: jnp.concatenate([a[None], t], axis=0), lu0, lu_tail)


def band_solve_qr(D, U, Lo, rhs):
    """Stable pivot-free block-tridiagonal solve via sequential block QR
    (banded QR elimination, Golub/Van Loan).  Unlike the unpivoted block-LU
    sweep, orthogonal elimination has bounded growth — this is what keeps
    float32 TPU solves alive on barely-regularized interior-point KKT
    systems; the QR panels are matmul-heavy and MXU-friendly.

    Fill-in extends one extra super-diagonal: stored per stage as
    (R_k, B_k, C_k, c_k) with back substitution
    x_k = R_k^-1 (c_k - B_k x_{k+1} - C_k x_{k+2}).
    """
    S, b = rhs.shape
    solve_tri = jax.scipy.linalg.solve_triangular

    def step(carry, inp):
        Dhat, Uhat, rhat = carry
        L_k, D_n, U_n, r_n = inp
        # One R-only QR of the augmented (2b, 3b+1) panel replaces
        # Q-formation + matmul: the trailing reflections only recombine the
        # not-yet-finalized rows orthogonally, which preserves the system.
        M = jnp.concatenate([
            jnp.concatenate([Dhat, Uhat, jnp.zeros((b, b), Dhat.dtype),
                             rhat[:, None]], axis=1),
            jnp.concatenate([L_k, D_n, U_n, r_n[:, None]], axis=1)],
            axis=0)
        R = jnp.linalg.qr(M, mode="r")                     # (2b, 3b+1)
        R_k = R[:b, :b]
        B_k = R[:b, b:2 * b]
        C_k = R[:b, 2 * b:3 * b]
        c_k = R[:b, 3 * b]
        Dhat_n = R[b:, b:2 * b]
        Uhat_n = R[b:, 2 * b:3 * b]
        rhat_n = R[b:, 3 * b]
        return (Dhat_n, Uhat_n, rhat_n), (R_k, B_k, C_k, c_k)

    zero = jnp.zeros((b, b), rhs.dtype)
    init = (D[0], U[0] if S > 1 else zero, rhs[0])
    if S > 1:
        U_ext = jnp.concatenate([U[1:], zero[None]], axis=0) \
            if S > 2 else zero[None]
        (Dh, Uh, rh), (Rs, Bs, Cs, cs) = jax.lax.scan(
            step, init, (Lo, D[1:], U_ext, rhs[1:]))
    else:
        Dh, Uh, rh = init
        Rs = jnp.zeros((0, b, b), rhs.dtype)
        Bs = jnp.zeros((0, b, b), rhs.dtype)
        Cs = jnp.zeros((0, b, b), rhs.dtype)
        cs = jnp.zeros((0, b), rhs.dtype)

    # last stage: dense QR solve (R-only on the augmented panel)
    Rf = jnp.linalg.qr(jnp.concatenate([Dh, rh[:, None]], axis=1),
                       mode="r")
    x_last = solve_tri(Rf[:b, :b], Rf[:b, b], lower=False)

    def bwd(carry, inp):
        x_next, x_next2 = carry
        R_k, B_k, C_k, c_k = inp
        x_k = solve_tri(R_k, c_k - B_k @ x_next - C_k @ x_next2,
                        lower=False)
        return (x_k, x_next), x_k

    if S > 1:
        (x0_, _), xs_rev = jax.lax.scan(
            bwd, (x_last, jnp.zeros((b,), rhs.dtype)),
            (Rs[::-1], Bs[::-1], Cs[::-1], cs[::-1]))
        xs = jnp.concatenate([xs_rev[::-1], x_last[None]], axis=0)
    else:
        xs = x_last[None]
    return xs


def band_solve(lu_all, U, Lo, rhs):
    """Solve with precomputed factors; rhs/result shape (S, b)."""
    lu_solve = jax.scipy.linalg.lu_solve

    def fwd(y_prev, inp):
        lu_km1, L_km1, r_k = inp
        y_k = r_k - L_km1 @ lu_solve(lu_km1, y_prev)
        return y_k, y_k

    lu_head = jax.tree.map(lambda x: x[:-1], lu_all)
    _, y_tail = jax.lax.scan(fwd, rhs[0], (lu_head, Lo, rhs[1:]))
    y_all = jnp.concatenate([rhs[0][None], y_tail], axis=0)

    lu_last = jax.tree.map(lambda x: x[-1], lu_all)
    x_N = lu_solve(lu_last, y_all[-1])

    def bwd(x_next, inp):
        lu_k, y_k, U_k = inp
        x_k = lu_solve(lu_k, y_k - U_k @ x_next)
        return x_k, x_k

    lu_rev = jax.tree.map(lambda x: x[:-1][::-1], lu_all)
    _, xs_rev = jax.lax.scan(bwd, x_N, (lu_rev, y_all[:-1][::-1], U[::-1]))
    return jnp.concatenate([xs_rev[::-1], x_N[None]], axis=0)
