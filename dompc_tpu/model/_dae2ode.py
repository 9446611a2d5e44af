"""Index-1 DAE -> ODE conversion (reference: do_mpc/model/_dae2odeconversion.py:27-109).

New states are [x, u, z], the new input is q = du/dt, and
dz/dt = -(dg/dz)^-1 (dg/dx * f + dg/du * q)   (reference :96).
Implemented with JAX autodiff at trace time — no symbolic inversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ._model import Model
from ..sym import Sym


def dae2odeconversion(model) -> Model:
    assert model.flags["setup"], "Model must be setup."
    assert model.n_z > 0, "Model has no algebraic states."
    n_x, n_u, n_z = model.n_x, model.n_u, model.n_z

    conv = Model(model.model_type)
    x_new = conv.set_variable("_x", "x_new", (n_x + n_u + n_z, 1))
    q = conv.set_variable("_u", "q", (max(n_u, 1), 1)) if n_u else None
    for name in model.spec("_p").names:
        conv.set_variable("_p", name, model.spec("_p").shapes[name])
    for name in model.spec("_tvp").names:
        conv.set_variable("_tvp", name, model.spec("_tvp").shapes[name])

    p_spec, tvp_spec = model.spec("_p"), model.spec("_tvp")

    def rhs_fn(env):
        xc = env["_x"]["x_new"]
        x, u, z = xc[:n_x], xc[n_x:n_x + n_u], xc[n_x + n_u:]
        qv = env["_u"]["q"][:n_u] if n_u else jnp.zeros((0,))
        p = p_spec.pack(env["_p"], xp=jnp) if p_spec.size else jnp.zeros((0,))
        tvp = (tvp_spec.pack(env["_tvp"], xp=jnp) if tvp_spec.size
               else jnp.zeros((0,)))
        w = jnp.zeros((model.n_w,))
        f = model._rhs_fun(x, u, z, tvp, p, w)
        g_x = jax.jacfwd(lambda xx: model._alg_fun(xx, u, z, tvp, p, w))(x)
        g_u = jax.jacfwd(lambda uu: model._alg_fun(x, uu, z, tvp, p, w))(u)
        g_z = jax.jacfwd(lambda zz: model._alg_fun(x, u, zz, tvp, p, w))(z)
        z_dot = -jnp.linalg.solve(g_z, g_x @ f + (g_u @ qv if n_u else 0.0))
        return jnp.concatenate([f, qv, z_dot])

    conv.set_rhs("x_new", Sym(rhs_fn))
    conv.setup()
    return conv
