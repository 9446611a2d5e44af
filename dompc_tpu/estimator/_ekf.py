"""Extended Kalman filter (reference: do_mpc/estimator/_ekf.py:33-471).

The reference builds a CasADi IDAS integrator for the augmented system
[x; vec(P)] with dP/dt = A P + P A^T + Q (ref :162-180); here the augmented
ODE is integrated by the jit-compiled Radau stepper with A(x) obtained from
``jax.jacfwd`` along the trajectory.  Discrete case: P+ = A P A^T + Q
(ref :301); gain L = P C^T (C P C^T + R)^-1 (ref :304)."""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ._base import Estimator
from ..tools import NumStruct
from ..ops.integrators import (make_adaptive_dae_integrator,
                               make_ode_integrator)


@dataclass
class EKFSettings:
    """``abstol/reltol`` are honored by the continuous-time covariance
    propagation: the augmented [x; vec(P)] ODE integrates with the same
    adaptive step-doubling Radau IIA the Simulator uses (the reference
    runs IDAS at 1e-10, do_mpc/estimator/_ekf.py:162-180).  Set
    ``adaptive=False`` for the fixed ``substeps``-per-t_step stepper."""
    t_step: float | None = None
    abstol: float = 1e-10
    reltol: float = 1e-10
    adaptive: bool = True
    substeps: int = 4   # fixed mode: substeps; adaptive: initial substeps

    def check_for_mandatory_settings(self):
        assert self.t_step is not None, "t_step must be set."


class EKF(Estimator):
    def __init__(self, model):
        super().__init__(model)
        assert model.n_z == 0, "EKF with algebraic equations not supported."
        self.settings = EKFSettings()
        self.flags = {"setup": False, "set_tvp_fun": False,
                      "set_p_fun": False, "set_initial_guess": False,
                      "first_step": True}
        self.tvp_fun = None
        self.p_fun = None
        self._P0 = None

    @property
    def P0(self):
        return self._P0

    @P0.setter
    def P0(self, val):
        val = np.asarray(val, dtype=float)
        assert val.shape == (self.model.n_x, self.model.n_x)
        self._P0 = val

    def get_tvp_template(self):
        return NumStruct(self.model.spec("_tvp"))

    def set_tvp_fun(self, fun):
        self.tvp_fun = fun
        self.flags["set_tvp_fun"] = True

    def get_p_template(self):
        return NumStruct(self.model.spec("_p"))

    def set_p_fun(self, fun):
        self.p_fun = fun
        self.flags["set_p_fun"] = True

    def setup(self):
        self.settings.check_for_mandatory_settings()
        model = self.model
        if self.tvp_fun is None:
            tmpl = self.get_tvp_template()
            self.set_tvp_fun(lambda t: tmpl)
        if self.p_fun is None:
            tmpl = self.get_p_template()
            self.set_p_fun(lambda t: tmpl)
        n_x = model.n_x
        zz = jnp.zeros((0,))

        def A_of(x, u, tvp, p):
            return jax.jacfwd(lambda xx: model._rhs_fun(
                xx, u, zz, tvp, p, jnp.zeros((model.n_w,))))(x)

        def C_of(x, u, tvp, p):
            return jax.jacfwd(lambda xx: model._meas_fun(
                xx, u, zz, tvp, p, jnp.zeros((model.n_v,))))(x)

        self._A_jit = jax.jit(A_of)
        self._C_jit = jax.jit(C_of)

        if model.model_type == "continuous":
            def aug_rhs(xp, args):
                u, tvp, p, Q = args
                x = xp[:n_x]
                P = xp[n_x:].reshape(n_x, n_x)
                f = model._rhs_fun(x, u, zz, tvp, p,
                                   jnp.zeros((model.n_w,)))
                A = A_of(x, u, tvp, p)
                dP = A @ P + P @ A.T + Q
                return jnp.concatenate([f, dP.reshape(-1)])

            st = self.settings
            if st.adaptive:
                # error-controlled propagation honoring abstol/reltol,
                # matching the reference's IDAS tolerances
                # (do_mpc/estimator/_ekf.py:162-180) and this package's
                # own Simulator behavior
                adaptive = make_adaptive_dae_integrator(
                    lambda x, z, args: aug_rhs(x, args),
                    lambda x, z, args: jnp.zeros((0,), x.dtype),
                    n_z=0, abstol=st.abstol, reltol=st.reltol,
                    init_substeps=st.substeps)

                def step(xp, args, h):
                    x, _ = adaptive(xp, jnp.zeros((0,), xp.dtype), args, h)
                    return x
            else:
                step = make_ode_integrator(aug_rhs, method="radau",
                                           substeps=st.substeps)
            self._xp_step = jax.jit(
                lambda xp, u, tvp, p, Q: step(xp, (u, tvp, p, Q),
                                              self.settings.t_step))
        self._rhs_jit = jax.jit(lambda x, u, tvp, p: model._rhs_fun(
            x, u, zz, tvp, p, jnp.zeros((model.n_w,))))
        self._meas_jit = jax.jit(lambda x, u, tvp, p: model._meas_fun(
            x, u, zz, tvp, p, jnp.zeros((model.n_v,))))

        if self._P0 is None:
            self._P0 = np.eye(n_x)
        self.flags["setup"] = True
        return self

    def set_initial_guess(self):
        assert self.flags["setup"], "EKF was not setup yet."
        self.flags["set_initial_guess"] = True

    def _num(self, v):
        if isinstance(v, NumStruct):
            return v.data
        return np.asarray(v, dtype=float).reshape(-1)

    def make_step(self, y_next, u_next, Q_k, R_k) -> np.ndarray:
        """Predict + update (reference: _ekf.py:231-329)."""
        assert self.flags["setup"], "EKF was not setup yet."
        model = self.model
        Q_k = np.asarray(Q_k, dtype=float)
        R_k = np.asarray(R_k, dtype=float)
        assert Q_k.shape == (model.n_x, model.n_x)
        assert R_k.shape == (model.n_y, model.n_y)
        y_next = self._num(y_next)
        u_next = self._num(u_next)
        t0 = self._t0
        tvp0 = self._num(self.tvp_fun(float(t0[0]))) if model.n_tvp \
            else np.zeros(0)
        p0 = self._num(self.p_fun(float(t0[0]))) if model.n_p \
            else np.zeros(0)
        x0 = self._x0.data.copy()
        P0 = self._P0
        self._t0 = self._t0 + self.settings.t_step

        A_k = np.asarray(self._A_jit(jnp.asarray(x0), jnp.asarray(u_next),
                                     jnp.asarray(tvp0), jnp.asarray(p0)))
        C_k = np.asarray(self._C_jit(jnp.asarray(x0), jnp.asarray(u_next),
                                     jnp.asarray(tvp0), jnp.asarray(p0)))

        if model.model_type == "continuous":
            xp0 = jnp.concatenate([jnp.asarray(x0),
                                   jnp.asarray(P0).reshape(-1)])
            sol = np.asarray(self._xp_step(
                xp0, jnp.asarray(u_next), jnp.asarray(tvp0),
                jnp.asarray(p0), jnp.asarray(Q_k)))
            x_apriori = sol[:model.n_x]
            P0 = sol[model.n_x:].reshape(model.n_x, model.n_x)
        else:
            x_apriori = np.asarray(self._rhs_jit(
                jnp.asarray(x0), jnp.asarray(u_next), jnp.asarray(tvp0),
                jnp.asarray(p0)))
            P0 = A_k @ P0 @ A_k.T + Q_k
        y_apriori = np.asarray(self._meas_jit(
            jnp.asarray(x_apriori), jnp.asarray(u_next), jnp.asarray(tvp0),
            jnp.asarray(p0)))

        L = P0 @ C_k.T @ np.linalg.inv(C_k @ P0 @ C_k.T + R_k)
        x0 = x_apriori + L @ (y_next - y_apriori)
        P0 = (np.eye(model.n_x) - L @ C_k) @ P0

        self._x0.data[:] = x0
        self._P0 = P0
        self.data.update(_x=x0)
        self.data.update(_u=u_next)
        if model.n_p:
            self.data.update(_p=p0)
        if model.n_tvp:
            self.data.update(_tvp=tvp0)
        # the reference logs the post-increment time due to numpy aliasing
        # of t0 with self._t0 (_ekf.py:278 vs :324); replicated for parity
        self.data.update(_time=self._t0)
        return x0.reshape(-1, 1)
