"""Stage-structured (block-tridiagonal) KKT factorization.

The collocation OCP's KKT matrix is block-tridiagonal in the stage index when
primal variables and constraint rows are grouped per stage (the reference
exploits the same sparsity only implicitly through IPOPT's general sparse
MUMPS/MA27 factorization, do_mpc/controller/_controllersettings.py:160-175).
Here the permuted KKT system is solved by a block-tridiagonal LU sweep
(Riccati-style forward elimination + back substitution) expressed as
``lax.scan`` over stages — O(N * b^3) instead of O((N*b)^3), and the inner
b x b operations are dense matmuls/solves that batch perfectly under ``vmap``
(thousands of NMPC instances per chip hit the MXU).

Scenario trees need no special casing: grouping all scenario nodes of a stage
into one block keeps the coupling strictly between consecutive stages
(branching constraints always connect a stage-k node to stage-k+1 children).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_stage_permutation(w_stage, g_stage, h_stage, n_stages):
    """Compute the stage-interleaved permutation of KKT rows.

    ``w_stage/g_stage/h_stage``: per-row stage assignment of the primal
    variables, equality rows and inequality rows.  Returns a dict with the
    padded permutation (indices into the (dim+1)-sized augmented system where
    index ``dim`` is a dummy identity row), block size and count.
    """
    n = len(w_stage)
    m = len(g_stage)
    q = len(h_stage)
    dim = n + m + q
    stages_of = np.concatenate([
        np.asarray(w_stage, int),
        np.asarray(g_stage, int),
        np.asarray(h_stage, int)])
    perm_blocks = []
    for k in range(n_stages):
        rows = np.nonzero(stages_of == k)[0]
        perm_blocks.append(rows)
    sizes = np.array([len(b) for b in perm_blocks])
    b_max = int(sizes.max())
    S = n_stages
    # Padded slots map to distinct dummy identity rows.  Two alternating
    # banks of dummies guarantee adjacent stages never share a dummy index,
    # so the extracted D/U/L blocks stay decoupled and nonsingular.
    perm_pad = np.zeros((S, b_max), dtype=int)
    for k, rows in enumerate(perm_blocks):
        perm_pad[k, :len(rows)] = rows
        n_padded = b_max - len(rows)
        bank = (k % 2) * b_max
        perm_pad[k, len(rows):] = dim + bank + np.arange(n_padded)
    return {
        "perm_pad": perm_pad, "b": b_max, "S": S, "dim": dim,
        "sizes": sizes, "n_dummy": 2 * b_max,
    }


def make_tridiag_kkt_solver(perm_data, n, m, q, delta_cons=1e-11):
    """Return a ``kkt_solve`` callback for :func:`make_ipm_solver`.

    Assembles the (dense) KKT matrix, permutes it into stage-interleaved
    order, extracts the block-tridiagonal bands and solves by a block LU
    sweep.  The O(dim^2) assembly is the current cost ceiling; the sweep
    itself is O(S * b^3).
    """
    perm_pad = jnp.asarray(perm_data["perm_pad"])
    b = perm_data["b"]
    S = perm_data["S"]
    dim = perm_data["dim"]
    n_dummy = perm_data["n_dummy"]
    flat_perm = perm_pad.reshape(-1)

    def kkt_solve(Hw, Sig_w, Jg, Jh, inv_sig_s, r_dw, r_g, r_h_mod, delta):
        dtype = Hw.dtype
        K = jnp.zeros((dim + n_dummy, dim + n_dummy), dtype)
        K = K.at[:n, :n].set(Hw + jnp.diag(Sig_w + delta))
        if m:
            K = K.at[:n, n:n + m].set(Jg.T)
            K = K.at[n:n + m, :n].set(Jg)
        if q:
            K = K.at[:n, n + m:dim].set(Jh.T)
            K = K.at[n + m:dim, :n].set(Jh)
            K = K.at[n + m:dim, n + m:dim].set(-jnp.diag(inv_sig_s))
        diag_reg = jnp.concatenate([
            jnp.zeros((n,), dtype), -delta_cons * jnp.ones((m + q,), dtype),
            jnp.ones((n_dummy,), dtype)])
        K = K + jnp.diag(diag_reg)
        rhs = jnp.concatenate([-r_dw, -r_g, -r_h_mod,
                               jnp.zeros((n_dummy,), dtype)])

        Kp = K[flat_perm][:, flat_perm].reshape(S, b, S, b)
        rp = rhs[flat_perm].reshape(S, b)
        ar = jnp.arange(S)
        D = Kp[ar, :, ar, :]                 # (S, b, b)
        U = Kp[ar[:-1], :, ar[1:], :]        # (S-1, b, b)
        Lo = Kp[ar[1:], :, ar[:-1], :]       # (S-1, b, b)

        lu_factor = jax.scipy.linalg.lu_factor
        lu_solve = jax.scipy.linalg.lu_solve

        # factorize once: Schur blocks S_k = D_k - L_{k-1} S_{k-1}^-1 U_{k-1}
        def fwd_fact(carry, inp):
            lu_prev = carry
            D_k, L_km1, U_km1 = inp
            X = lu_solve(lu_prev, U_km1)
            S_k = D_k - L_km1 @ X
            lu_k = lu_factor(S_k)
            return lu_k, lu_k

        lu0 = lu_factor(D[0])
        _, lu_tail = jax.lax.scan(fwd_fact, lu0, (D[1:], Lo, U))
        lu_all = jax.tree.map(
            lambda a, b_: jnp.concatenate([a[None], b_], axis=0),
            lu0, lu_tail)

        def solve_with_factors(rp_):
            def fwd(y_prev, inp):
                lu_km1, L_km1, r_k = inp
                y_k = r_k - L_km1 @ lu_solve(lu_km1, y_prev)
                return y_k, y_k

            lu_head = jax.tree.map(lambda x: x[:-1], lu_all)
            _, y_tail = jax.lax.scan(fwd, rp_[0], (lu_head, Lo, rp_[1:]))
            y_all = jnp.concatenate([rp_[0][None], y_tail], axis=0)

            lu_last = jax.tree.map(lambda x: x[-1], lu_all)
            x_N = lu_solve(lu_last, y_all[-1])

            def bwd(x_next, inp):
                lu_k, y_k, U_k = inp
                x_k = lu_solve(lu_k, y_k - U_k @ x_next)
                return x_k, x_k

            lu_rev = jax.tree.map(lambda x: x[:-1][::-1], lu_all)
            _, xs_rev = jax.lax.scan(
                bwd, x_N, (lu_rev, y_all[:-1][::-1], U[::-1]))
            return jnp.concatenate([xs_rev[::-1], x_N[None]], axis=0)

        x_pad = solve_with_factors(rp)

        # one step of iterative refinement against the assembled system
        # (block elimination without inter-block pivoting loses accuracy on
        # barely-regularized saddle points; refinement recovers it cheaply)
        Kp_flat = Kp.reshape(S * b, S * b)
        resid = rp.reshape(-1) - Kp_flat @ x_pad.reshape(-1)
        x_pad = x_pad + solve_with_factors(resid.reshape(S, b))

        # scatter back (dummy entries land beyond index dim and are dropped)
        sol = jnp.zeros((dim + n_dummy,), dtype).at[flat_perm].set(
            x_pad.reshape(-1))
        sol = sol[:dim]
        return sol[:n], sol[n:n + m], sol[n + m:]

    return kkt_solve
