"""Plant simulator.

Re-design of the reference ``do_mpc/simulator.py:106-850``.  The SUNDIALS
CVODES/IDAS adaptive integrators (ref :399-416) are replaced by jit-compiled
fixed-substep implicit Radau IIA collocation (stiff/DAE) or RK4 — pure JAX,
vmap-able for batched rollouts.  The IPOPT root-finder for discrete DAEs
(ref :363-378) becomes a Newton solve inside jit.

`make_step` mirrors the reference's data semantics exactly
(do_mpc/simulator.py:757-850): logs the *current* x/u/previous-z/aux, returns
the measurement at the next state.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .model._iteratedvariables import IteratedVariables
from .tools import NumStruct, FieldAccessor
from .tools import _profiler as profiler
from .data import Data
from .ops.integrators import (make_adaptive_dae_integrator,
                              make_dae_integrator, make_ode_integrator,
                              newton_rootfind)


@dataclass
class SimulatorSettings:
    """Reference: do_mpc/simulator.py:41-102.

    ``abstol/reltol`` are honored: the default integrator is an adaptive
    step-doubling Radau IIA whose local-error test uses exactly these
    tolerances (the reference runs CVODES/IDAS at 1e-10, ref :90-97).  Set
    ``adaptive=False`` for the fixed ``substeps``-per-t_step integrator
    (cheaper per step, no error control)."""
    t_step: float | None = None
    abstol: float = 1e-10
    reltol: float = 1e-10
    integration_tool: str = "radau"   # 'cvodes'/'idas' accepted as aliases
    adaptive: bool = True             # error-controlled step adaptation
    substeps: int = 4                 # fixed mode: substeps per t_step;
                                      # adaptive mode: initial substeps
    collocation_deg: int = 3          # Radau IIA stages (order 2*deg-1)

    def check_for_mandatory_settings(self):
        assert self.t_step is not None, "t_step must be set."


class Simulator(IteratedVariables):
    """Forward-simulates the model one ``t_step`` per ``make_step`` call."""

    def __init__(self, model):
        assert model.flags["setup"], "Model must be setup before Simulator."
        self._init_iterated_variables(model)
        self.settings = SimulatorSettings()
        self.data = Data(model)
        self.flags = {"setup": False, "set_tvp_fun": False, "set_p_fun": False,
                      "first_step": True}

        self._x_scaling = NumStruct(model.spec("_x"), 1.0)
        self._z_scaling = NumStruct(model.spec("_z"), 1.0)
        self.tvp_fun = None
        self.p_fun = None

    # -------------------------------------------------------------- scaling
    @property
    def scaling(self):
        def get(key):
            vt = key[0]
            tgt = {"_x": self._x_scaling, "_z": self._z_scaling}[vt]
            return tgt[key[1:]] if len(key) > 1 else tgt

        def set_(key, value):
            vt = key[0]
            tgt = {"_x": self._x_scaling, "_z": self._z_scaling}[vt]
            if len(key) > 1:
                tgt[key[1:]] = value
            else:
                tgt.master = value
        return FieldAccessor(get, set_)

    # ----------------------------------------------------------- templating
    def set_param(self, **kwargs):
        for k, v in kwargs.items():
            if k == "integration_tool":
                v = {"cvodes": "radau", "idas": "radau"}.get(v, v)
            if hasattr(self.settings, k):
                setattr(self.settings, k, v)

    def get_tvp_template(self):
        return NumStruct(self.model.spec("_tvp"))

    def set_tvp_fun(self, tvp_fun):
        self.tvp_fun = tvp_fun
        self.flags["set_tvp_fun"] = True

    def get_p_template(self):
        return NumStruct(self.model.spec("_p"))

    def set_p_fun(self, p_fun):
        self.p_fun = p_fun
        self.flags["set_p_fun"] = True

    # ---------------------------------------------------------------- setup
    def setup(self):
        self.settings.check_for_mandatory_settings()
        model = self.model

        if self.tvp_fun is None:
            tmpl = self.get_tvp_template()
            self.tvp_fun = lambda t: tmpl
        if self.p_fun is None:
            tmpl = self.get_p_template()
            self.p_fun = lambda t: tmpl

        # args pytree = (u, tvp, p, w)
        def f(x, z, args):
            u, tvp, p, w = args
            return model._rhs_fun(x, u, z, tvp, p, w)

        def g(x, z, args):
            u, tvp, p, w = args
            return model._alg_fun(x, u, z, tvp, p, w)

        s = self.settings
        if model.model_type == "continuous":
            if model.n_z > 0 or s.integration_tool in ("radau", "cvodes",
                                                       "idas"):
                if s.adaptive:
                    stepper = make_adaptive_dae_integrator(
                        f, g, n_z=model.n_z, deg=s.collocation_deg,
                        abstol=s.abstol, reltol=s.reltol,
                        init_substeps=s.substeps)
                else:
                    stepper = make_dae_integrator(
                        f, g, n_z=model.n_z, substeps=s.substeps,
                        deg=s.collocation_deg)
            else:
                ode = make_ode_integrator(
                    lambda x, args: f(x, jnp.zeros((0,)), args),
                    method="rk4", substeps=max(s.substeps, 10))
                stepper = lambda x, z, args, h: (ode(x, args, h), z)

            def _sim(x0, z0, u, tvp, p, w, h):
                return stepper(x0, z0, (u, tvp, p, w), h)
        else:
            def _sim(x0, z0, u, tvp, p, w, h):
                args = (u, tvp, p, w)
                if model.n_z > 0:
                    z0 = newton_rootfind(
                        lambda z, a: g(x0, z, a), z0, args)
                x_new = f(x0, z0, args)
                return x_new, z0

        self._sim_jit = jax.jit(_sim)
        self._meas_jit = jax.jit(model._meas_fun)
        self._aux_jit = jax.jit(model._aux_expression_fun)
        self.flags["setup"] = True
        return self

    def reset_history(self):
        """Clear logged data and reset time (reference API)."""
        self._t0 = np.zeros(1)
        self.data.init_storage()

    def set_initial_guess(self):
        """Set z initial guess from z0 (reference: simulator.py:~600)."""
        self._z_guess = self._z0.data.copy()

    def init_algebraic_variables(self):
        """Solve the algebraic equations for consistent z0
        (reference: simulator.py:621-687) by Newton instead of IPOPT."""
        model = self.model
        u = jnp.asarray(self._u0.data)
        tvp = jnp.asarray(self.tvp_fun(self._t0).data if hasattr(
            self.tvp_fun(self._t0), "data") else self.tvp_fun(self._t0))
        p = jnp.asarray(self.p_fun(self._t0).data if hasattr(
            self.p_fun(self._t0), "data") else self.p_fun(self._t0))
        w = jnp.zeros(model.n_w)
        x = jnp.asarray(self._x0.data)

        def galg(z, args):
            return model._alg_fun(x, u, z, tvp, p, w)

        z = newton_rootfind(galg, jnp.asarray(self._z0.data), None)
        self._z0.data[:] = np.asarray(z)
        self.set_initial_guess()
        return self._z0.data.reshape(-1, 1)

    # ------------------------------------------------------------ runtime --
    def _num(self, v, spec_name):
        """Accept NumStruct / array / scalar and return flat numpy vector."""
        if isinstance(v, NumStruct):
            return v.data
        return np.asarray(v, dtype=float).reshape(-1)

    def simulate(self):
        """One raw integration step using current internal values
        (reference: simulator.py:690-755)."""
        with profiler.annotate("dompc_tpu.Simulator.simulate"):
            x, z = self._sim_jit(*self._sim_args)
        return np.asarray(x), np.asarray(z)

    def make_step(self, u0=None, v0=None, w0=None) -> np.ndarray:
        assert self.flags["setup"], "Simulator is not setup. Call setup() first."
        model = self.model
        if u0 is None:
            assert model.n_u == 0, "No input u0 provided."
            u0 = np.zeros(0)
        u0 = self._num(u0, "_u")
        w0 = np.zeros(model.n_w) if w0 is None else self._num(w0, "_w")
        v0 = np.zeros(model.n_v) if v0 is None else self._num(v0, "_v")

        tvp0 = self._num(self.tvp_fun(self._t0), "_tvp") if model.n_tvp else np.zeros(0)
        p0 = self._num(self.p_fun(self._t0), "_p") if model.n_p else np.zeros(0)

        x0 = self._x0.data.copy()
        z0_prev = getattr(self, "_z_guess", self._z0.data).copy()

        aux0 = np.asarray(self._aux_jit(
            jnp.asarray(x0), jnp.asarray(u0), jnp.asarray(z0_prev),
            jnp.asarray(tvp0), jnp.asarray(p0)))

        self._sim_args = (jnp.asarray(x0 / self._x_scaling.data),
                          jnp.asarray(z0_prev / self._z_scaling.data
                                      if model.n_z else z0_prev),
                          jnp.asarray(u0), jnp.asarray(tvp0), jnp.asarray(p0),
                          jnp.asarray(w0), self.settings.t_step)
        x_next_scaled, z_next_scaled = self.simulate()
        x_next = x_next_scaled * self._x_scaling.data
        z_next = (z_next_scaled * self._z_scaling.data
                  if model.n_z else z_next_scaled)

        y_next = np.asarray(self._meas_jit(
            jnp.asarray(x_next), jnp.asarray(u0), jnp.asarray(z_next),
            jnp.asarray(tvp0), jnp.asarray(p0), jnp.asarray(v0)))

        self.data.update(_x=x0)
        self.data.update(_u=u0)
        self.data.update(_z=z0_prev)
        self.data.update(_tvp=tvp0)
        self.data.update(_p=p0)
        self.data.update(_y=y_next)
        self.data.update(_aux=aux0)
        self.data.update(_time=self._t0)

        self._x0.data[:] = x_next
        self._z0.data[:] = z_next
        self._z_guess = z_next.copy()
        self._u0.data[:] = u0
        self._t0 = self._t0 + self.settings.t_step
        self.flags["first_step"] = False

        return y_next.reshape(-1, 1)
