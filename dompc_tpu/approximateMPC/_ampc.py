"""Neural surrogate of the MPC policy.

Re-design of ``do_mpc/approximateMPC/_ampc.py:32-445``: the reference's
PyTorch MLP becomes a flax.linen module trained with optax; input/output
min-max scaling is derived from the MPC box bounds exactly as in the
reference (``set_shift_values`` ref :283-300, requires finite bounds ref
:251-257), and ``make_step`` (ref :374-428) clips to the input bounds.
"""
from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ._ampcsettings import ApproximateMPCSettings

_ACTS = {"tanh": jnp.tanh, "relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid,
         "linear": lambda x: x}


class FeedforwardNN(nn.Module):
    """MLP policy network (reference FeedforwardNN, _ampc.py:32-111)."""
    n_in: int
    n_out: int
    n_hidden_layers: int = 3
    n_neurons: int = 50
    act_fn: str = "tanh"
    output_act_fn: str = "linear"

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.act_fn]
        for _ in range(self.n_hidden_layers):
            x = act(nn.Dense(self.n_neurons)(x))
        x = nn.Dense(self.n_out)(x)
        return _ACTS[self.output_act_fn](x)


class ApproxMPC:
    """Approximate MPC policy u = pi(x0[, u_prev]) (reference :32)."""

    def __init__(self, mpc, settings: ApproximateMPCSettings | None = None):
        self.mpc = mpc
        self.settings = settings or ApproximateMPCSettings()
        model = mpc.model
        self.n_x = model.n_x
        self.n_u = model.n_u
        # input includes u_prev when an rterm was set (reference :219-234)
        self.use_u_prev = bool(np.any(mpc.rterm_factor.data != 0)) \
            or mpc._rterm_fun_sym is not None
        self.n_in = self.n_x + (self.n_u if self.use_u_prev else 0)
        self.n_out = self.n_u
        self.net = FeedforwardNN(
            n_in=self.n_in, n_out=self.n_out,
            n_hidden_layers=self.settings.n_hidden_layers,
            n_neurons=self.settings.n_neurons,
            act_fn=self.settings.act_fn,
            output_act_fn=self.settings.output_act_fn)
        self.params = self.net.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, self.n_in)))
        self.set_shift_values()
        self._apply = jax.jit(lambda params, x: self.net.apply(params, x))

    # ------------------------------------------------------------- scaling
    def set_shift_values(self):
        """Min-max input/output scaling from the MPC box bounds
        (reference :283-300)."""
        mpc = self.mpc
        x_lb, x_ub = mpc._x_lb.data, mpc._x_ub.data
        u_lb, u_ub = mpc._u_lb.data, mpc._u_ub.data
        assert np.all(np.isfinite(x_lb)) and np.all(np.isfinite(x_ub)), \
            "ApproxMPC requires finite state bounds for scaling."
        assert np.all(np.isfinite(u_lb)) and np.all(np.isfinite(u_ub)), \
            "ApproxMPC requires finite input bounds for scaling."
        in_lb = np.concatenate([x_lb, u_lb]) if self.use_u_prev else x_lb
        in_ub = np.concatenate([x_ub, u_ub]) if self.use_u_prev else x_ub
        self.in_shift = in_lb
        self.in_range = np.where(in_ub > in_lb, in_ub - in_lb, 1.0)
        self.out_shift = u_lb
        self.out_range = np.where(u_ub > u_lb, u_ub - u_lb, 1.0)
        self.u_lb, self.u_ub = u_lb, u_ub

    def scale_inputs(self, x):
        return (x - self.in_shift) / self.in_range

    def rescale_outputs(self, y):
        return y * self.out_range + self.out_shift

    # ------------------------------------------------------------- runtime
    def __call__(self, params, x_scaled):
        return self.net.apply(params, x_scaled)

    def make_step(self, x0, u_prev=None, clip_to_bounds=True):
        """Evaluate the learned policy (reference :374-428)."""
        x0 = np.asarray(x0, dtype=float).reshape(-1)
        if self.use_u_prev:
            assert u_prev is not None, "policy input includes u_prev"
            u_prev = np.asarray(u_prev, dtype=float).reshape(-1)
            inp = np.concatenate([x0, u_prev])
        else:
            inp = x0
        xin = jnp.asarray(self.scale_inputs(inp)[None, :])
        y = np.asarray(self._apply(self.params, xin))[0]
        u0 = self.rescale_outputs(y)
        if clip_to_bounds:
            u0 = np.clip(u0, self.u_lb, self.u_ub)
        return u0.reshape(-1, 1)

    # ------------------------------------------------------------ storage
    def save_to_state_dict(self, path="approx_mpc.pkl"):
        with open(path, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, self.params), f)

    def load_from_state_dict(self, path="approx_mpc.pkl"):
        with open(path, "rb") as f:
            self.params = jax.tree.map(jnp.asarray, pickle.load(f))
