"""Moving-horizon estimator.

TPU-native re-design of ``do_mpc/estimator/_mhe.py:36-1261``: same NLP
semantics — optional parameter estimation (``p_est_list`` split, ref
:162-188), arrival cost + stage cost (``set_objective`` ref :489,
``set_default_objective`` ref :602-715), measurement-sequence templates
(``get_y_template/set_y_fun`` ref :745-800, ``meas_from_data`` default ref
:842-856), collocation + continuity + measurement-equality constraints
(ref :1144-1160) — assembled as instance-local vmapped JAX functions and
solved by the batched interior-point solver.

The estimated parameters couple every stage; the structured KKT path
treats them as a border on the stage-banded system (bordered-band
factorization, see ``_make_structured_solve`` below) with a dense-KKT
fallback for layouts the band plan cannot express.
"""
from __future__ import annotations

import time as _time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..model._iteratedvariables import IteratedVariables
from ..model._model import SymView
from ..optimizer import Optimizer, OCPLayout, make_stage_residual
from ..tools import NumStruct, StructSpec
from ..tools import _profiler as profiler
from ..data import Data
from ..solver.ipm import make_ipm_solver, IPMSettings, ipm_settings_from
from .. import sym as casym
from ._estimatorsettings import MHESettings


class _YTemplate:
    """Measurement-sequence template: ``y_template['y_meas', k] = ...``."""

    def __init__(self, n_horizon, n_y):
        self._data = np.zeros((n_horizon, n_y))

    def __setitem__(self, key, value):
        if isinstance(key, tuple) and key[0] == "y_meas":
            key = key[1:]
        k = key[0] if isinstance(key, tuple) else key
        self._data[k] = np.asarray(value, dtype=float).reshape(-1)

    def __getitem__(self, key):
        if isinstance(key, tuple) and key[0] == "y_meas":
            key = key[1:]
        if key == () or key is None:
            return self._data
        return self._data[key]

    def array(self):
        return self._data


class MHE(Optimizer, IteratedVariables):
    """Moving horizon estimator (reference: estimator/_mhe.py:36)."""

    # power-index extension: bounds/scaling on estimated parameters
    # (reference: optimizer.py:305,334,404,428)
    _BOUND_MAP = {**Optimizer._BOUND_MAP,
                  ("lower", "_p_est"): "_p_est_lb",
                  ("upper", "_p_est"): "_p_est_ub"}
    _SCALING_MAP = {**Optimizer._SCALING_MAP, "_p_est": "_p_est_scaling"}

    def __init__(self, model, p_est_list=()):
        assert model.flags["setup"], "Model must be setup before MHE."
        self._init_iterated_variables(model)
        self._init_optimizer()
        self.settings = MHESettings()
        self.data = Data(model)
        self.flags = {
            "setup": False, "set_objective": False, "set_tvp_fun": False,
            "set_p_fun": False, "set_y_fun": False,
            "set_initial_guess": False, "initial_run": False,
        }
        # split p into estimated / set parameters (reference :162-188)
        p_spec = model.spec("_p")
        self._p_est_spec = StructSpec(
            [(n, p_spec.shapes[n]) for n in p_spec.names if n in p_est_list])
        self._p_set_spec = StructSpec(
            [(n, p_spec.shapes[n]) for n in p_spec.names
             if n not in p_est_list])
        self.n_p_est = self._p_est_spec.size
        self.n_p_set = self._p_set_spec.size
        self._p_est0 = NumStruct(self._p_est_spec)
        self._p_est_scaling = NumStruct(self._p_est_spec, 1.0)
        # estimated-parameter box bounds (reference: optimizer.py:305,334
        # accepts '_p_est' in the bounds power index; storage at
        # estimator/_mhe.py:201-202)
        self._p_est_lb = NumStruct(self._p_est_spec, -np.inf)
        self._p_est_ub = NumStruct(self._p_est_spec, np.inf)
        self._stage_cost = None
        self._arrival_cost = None
        self.y_fun = None
        self._nl_cons_extra_specs = {"_p_est": self._p_est_spec,
                                     "_p_set": self._p_set_spec,
                                     "_x_prev": model.spec("_x")}

    # ------------------------------------------------------- sym accessors
    @property
    def _x(self): return self.model.x
    @property
    def _w(self): return SymView("_w", self.model.spec("_w"))
    @property
    def _v(self): return SymView("_v", self.model.spec("_v"))
    @property
    def _x_prev(self): return SymView("_x_prev", self.model.spec("_x"))
    @property
    def _p_est(self): return SymView("_p_est", self._p_est_spec)
    @property
    def _p_est_prev(self): return SymView("_p_est_prev", self._p_est_spec)
    @property
    def _p_set(self): return SymView("_p_set", self._p_set_spec)

    def _p_cat(self, p_est_vec, p_set_vec, xp=np):
        """Recombine est/set parameters into the model p order
        (reference ``_p_cat_fun``)."""
        parts = []
        ei = si = 0
        for name in self.model.spec("_p").names:
            if name in self._p_est_spec:
                sz = self._p_est_spec.block_size(name)
                parts.append(p_est_vec[..., ei:ei + sz])
                ei += sz
            else:
                sz = self._p_set_spec.block_size(name)
                parts.append(p_set_vec[..., si:si + sz])
                si += sz
        if not parts:
            return xp.zeros((0,))
        return xp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------- config
    def set_objective(self, stage_cost, arrival_cost):
        assert not self.flags["setup"]
        self._stage_cost = casym.to_sym(stage_cost)
        self._arrival_cost = casym.to_sym(arrival_cost)
        self.flags["set_objective"] = True

    def set_default_objective(self, P_x, P_v=None, P_p=None, P_w=None):
        """Weighted-norm default objective (reference :602-715).
        Weights may be numeric or Sym (e.g. tvp entries)."""
        model = self.model
        stage = casym.to_sym(0.0)
        if P_v is not None:
            v = self._v.cat
            stage = stage + casym.mtimes(casym.mtimes(v.T, P_v), v)
        else:
            assert model.n_v == 0, "P_v required (model has meas noise)."
        if P_w is not None:
            w = self._w.cat
            stage = stage + casym.mtimes(casym.mtimes(w.T, P_w), w)
        else:
            assert model.n_w == 0, "P_w required (model has process noise)."
        dx = self._x.cat - self._x_prev.cat
        arrival = casym.mtimes(casym.mtimes(dx.T, P_x), dx)
        if P_p is not None:
            dp = self._p_est.cat - self._p_est_prev.cat
            arrival = arrival + casym.mtimes(casym.mtimes(dp.T, P_p), dp)
        else:
            assert self.n_p_est == 0, "P_p required (estimating parameters)."
        self.set_objective(stage, arrival)

    def get_p_template(self):
        return NumStruct(self._p_set_spec)

    def set_p_fun(self, p_fun):
        self.p_fun = p_fun
        self.flags["set_p_fun"] = True

    def get_y_template(self):
        return _YTemplate(self.settings.n_horizon, self.model.n_y)

    def set_y_fun(self, y_fun):
        self.y_fun = y_fun
        self.flags["set_y_fun"] = True

    @property
    def p_est0(self):
        return self._p_est0

    @p_est0.setter
    def p_est0(self, val):
        v = np.asarray(val, dtype=float).reshape(-1)
        if v.size == 1:
            v = np.full(self._p_est_spec.size, v[0])
        self._p_est0.master = v

    def _tvp_template_len(self):
        return self.settings.n_horizon

    # --------------------------------------------------------------- setup
    def setup(self):
        st = self.settings
        st.check_for_mandatory_settings()
        model = self.model
        self._setup_nl_cons()
        if not self.flags["set_objective"]:
            raise RuntimeError("Objective undefined: call set_objective() "
                               "or set_default_objective().")
        if not self.flags["set_tvp_fun"] and model.n_tvp > 0:
            raise RuntimeError("Model has tvp but set_tvp_fun() not called.")
        if not self.flags["set_p_fun"] and self.n_p_set > 0:
            raise RuntimeError("Set parameters require set_p_fun().")
        if self.n_p_set == 0 and self.p_fun is None:
            tmpl = self.get_p_template()
            self.set_p_fun(lambda t: tmpl)
        if not self.flags["set_y_fun"]:
            # default: read own measurement history (reference :842-856)
            y_template = self.get_y_template()

            def y_fun(t_now):
                n_steps = min(self.data._y.shape[0], st.n_horizon)
                for k in range(-n_steps, 0):
                    y_template["y_meas", k] = self.data._y[k]
                for k in range(st.n_horizon - n_steps):
                    if n_steps > 0:
                        y_template["y_meas", k] = self.data._y[-n_steps]
                return y_template
            self.set_y_fun(y_fun)

        n_x, n_u, n_z = model.n_x, model.n_u, model.n_z
        n_w, n_v, n_y = model.n_w, model.n_v, model.n_y
        n_tvp = model.n_tvp
        N = st.n_horizon
        nev = self.n_eps_vars
        n_eps_rep = 1 if st.nl_cons_single_slack else N

        stage_g, n_coll = make_stage_residual(
            model, st, self._x_scaling.data, self._z_scaling.data,
            self._u_scaling.data)
        self.n_total_coll_points = n_coll
        n_coll_z = max(n_coll, 1) if n_z else 0

        # ----- layout: single chain + per-stage w/v + global p_est -----
        L = OCPLayout()
        for k in range(N):
            L.add(("x_node", k, 0), n_x, k)
            if n_u:
                L.add(("u", k, 0), n_u, k)
            if n_w:
                L.add(("w", k), n_w, k)
            if n_v:
                L.add(("v", k), n_v, k)
            if k < n_eps_rep and nev:
                L.add(("eps", k, 0), nev, k)
            if n_coll:
                L.add(("x_coll", k, 0), n_coll * n_x, k)
            if n_z:
                L.add(("z", k, 0), n_coll_z * n_z, k)
        L.add(("x_node", N, 0), n_x, N)
        if self.n_p_est:
            L.add(("p_est",), self.n_p_est, N)
        self.layout = L
        self.n_opt_x = L.size

        # scaling / bounds over w
        scal = np.ones(L.size)
        lb = np.full(L.size, -np.inf)
        ub = np.full(L.size, np.inf)
        xs, us, zs = (self._x_scaling.data, self._u_scaling.data,
                      self._z_scaling.data)
        for key in L.offsets:
            kind = key[0]
            if kind == "x_node":
                scal[L.sl(key)] = xs
                k = key[1]
                if 1 <= k <= N:
                    lb[L.sl(key)] = self._x_lb.data / xs
                    ub[L.sl(key)] = self._x_ub.data / xs
            elif kind == "x_coll":
                scal[L.sl(key)] = np.tile(xs, n_coll)
                if st.cons_check_colloc_points and key[1] <= N - 1:
                    lb[L.sl(key)] = np.tile(self._x_lb.data / xs, n_coll)
                    ub[L.sl(key)] = np.tile(self._x_ub.data / xs, n_coll)
            elif kind == "z":
                scal[L.sl(key)] = np.tile(zs, n_coll_z)
                lb[L.sl(key)] = np.tile(self._z_lb.data / zs, n_coll_z)
                ub[L.sl(key)] = np.tile(self._z_ub.data / zs, n_coll_z)
            elif kind == "u":
                scal[L.sl(key)] = us
                lb[L.sl(key)] = self._u_lb.data / us
                ub[L.sl(key)] = self._u_ub.data / us
            elif kind == "eps":
                lb[L.sl(key)] = self._eps_lb
                ub[L.sl(key)] = self._eps_ub
            elif kind == "p_est":
                pes_ = self._p_est_scaling.data
                scal[L.sl(key)] = pes_
                lb[L.sl(key)] = self._p_est_lb.data / pes_
                ub[L.sl(key)] = self._p_est_ub.data / pes_
        self.opt_x_scaling = scal
        self._lb_opt_x = lb
        self._ub_opt_x = ub

        # opt_p layout: [x_prev, p_est_prev, p_set, tvp(N), y_meas(N)]
        self._p_sl = {}
        off = 0
        for name, size in [("x_prev", n_x), ("p_est_prev", self.n_p_est),
                           ("p_set", self.n_p_set), ("tvp", N * n_tvp),
                           ("y_meas", N * n_y)]:
            self._p_sl[name] = slice(off, off + size)
            off += size
        self.n_opt_p = off

        self._build_nlp_functions(stage_g, n_coll, n_coll_z)
        self._create_solver()
        self._prepare_data()
        self.flags["setup"] = True
        return self

    # ---------------------------------------------------------- functions
    def _build_nlp_functions(self, stage_g, n_coll, n_coll_z):
        st = self.settings
        model = self.model
        n_x, n_u, n_z = model.n_x, model.n_u, model.n_z
        n_w, n_v, n_y, n_tvp = (model.n_w, model.n_v, model.n_y,
                                model.n_tvp)
        N = st.n_horizon
        nev = self.n_eps_vars
        n_nl = self.n_nl_cons
        L = self.layout
        psl = self._p_sl
        xs = jnp.asarray(self._x_scaling.data)
        us = jnp.asarray(self._u_scaling.data)
        zs = jnp.asarray(self._z_scaling.data)
        pes = jnp.asarray(self._p_est_scaling.data)
        n_eps_rep = 1 if st.nl_cons_single_slack else N
        check_colloc = st.nl_cons_check_colloc_points and n_coll > 0
        stage_cost, arrival = self._stage_cost, self._arrival_cost
        nl_list = self.nl_cons_list
        slack_names = {s["slack_name"] for s in self.slack_vars_list}
        eps_spec = self._eps_spec
        nl_ub = jnp.asarray(self._nl_cons_ub)
        epsterm = self._epsterm_fun
        p_est_idx = (jnp.asarray(L.idx(("p_est",))) if self.n_p_est
                     else jnp.zeros((0,), int))

        def stage_indices(k):
            d = {
                "node": L.idx(("x_node", k, 0)),
                "node_next": L.idx(("x_node", k + 1, 0)),
                "coll": L.idx(("x_coll", k, 0)) if n_coll else np.zeros(0, int),
                "u": L.idx(("u", k, 0)) if n_u else np.zeros(0, int),
                "w": L.idx(("w", k)) if n_w else np.zeros(0, int),
                "v": L.idx(("v", k)) if n_v else np.zeros(0, int),
                "z": L.idx(("z", k, 0)) if n_z else np.zeros(0, int),
                "eps": L.idx(("eps", min(k, n_eps_rep - 1), 0))
                if nev else np.zeros(0, int),
                "tvp": psl["tvp"].start + k * n_tvp + np.arange(n_tvp),
                "y": psl["y_meas"].start + k * n_y + np.arange(n_y),
            }
            return d

        A = {key: jnp.asarray(np.stack([stage_indices(k)[key]
                                        for k in range(N)]))
             for key in ("node", "node_next", "coll", "u", "w", "v", "z",
                         "eps", "tvp", "y")}

        def pfull(w_vec, pvec):
            p_est = w_vec[p_est_idx] * pes
            p_set = pvec[psl["p_set"]]
            return self._p_cat(p_est, p_set, xp=jnp)

        def env_scalar(expr, env):
            return jnp.asarray(expr(env)).reshape(())

        def nl_cons_eval(x, u, z, tvp, p_est, p_set, eps):
            env = model._env(x, u, z, tvp,
                             self._p_cat(p_est, p_set, xp=jnp))
            env["_p_est"] = self._p_est_spec.unpack(p_est, xp=jnp)
            env["_p_set"] = self._p_set_spec.unpack(p_set, xp=jnp)
            parts = []
            for c in nl_list:
                size = int(np.prod(c["shape"]))
                val = model._flat(c["expr"](env), size)
                if c["expr_name"] in slack_names:
                    val = val - eps[eps_spec.slice(c["expr_name"])]
                parts.append(val)
            out = (jnp.concatenate(parts) if parts
                   else jnp.zeros((0,), jnp.asarray(x).dtype))
            return out - nl_ub

        wnoise0 = jnp.zeros((model.n_w,))

        def f(w_vec, pvec):
            p = pfull(w_vec, pvec)
            p_est = w_vec[p_est_idx] * pes
            # arrival cost
            env_arr = {
                "_x": model.spec("_x").unpack(w_vec[A["node"][0]] * xs,
                                              xp=jnp),
                "_x_prev": model.spec("_x").unpack(pvec[psl["x_prev"]],
                                                   xp=jnp),
                "_p_est": self._p_est_spec.unpack(p_est, xp=jnp),
                "_p_est_prev": self._p_est_spec.unpack(
                    pvec[psl["p_est_prev"]], xp=jnp),
                "_p_set": self._p_set_spec.unpack(pvec[psl["p_set"]],
                                                  xp=jnp),
                "_p": model.spec("_p").unpack(p, xp=jnp),
            }
            obj = env_scalar(arrival, env_arr)

            def stage_obj(wk, vk, tvp):
                env = {
                    "_w": model.spec("_w").unpack(wk, xp=jnp),
                    "_v": model.spec("_v").unpack(vk, xp=jnp),
                    "_tvp": model.spec("_tvp").unpack(tvp, xp=jnp),
                    "_p": model.spec("_p").unpack(p, xp=jnp),
                    "_p_est": env_arr["_p_est"],
                    "_p_set": env_arr["_p_set"],
                }
                return env_scalar(stage_cost, env)

            WK = w_vec[A["w"]] if n_w else jnp.zeros((N, 0), w_vec.dtype)
            VK = w_vec[A["v"]] if n_v else jnp.zeros((N, 0), w_vec.dtype)
            TVP = pvec[A["tvp"]]
            obj = obj + jnp.sum(jax.vmap(stage_obj)(WK, VK, TVP))
            if nev:
                obj = obj + jnp.sum(jax.vmap(epsterm)(w_vec[A["eps"]]))
            return obj

        def g(w_vec, pvec):
            p = pfull(w_vec, pvec)

            def stage_res(node, coll, u, z, wk, vk, tvp, y_meas, node_next):
                res = []
                if model.model_type == "discrete":
                    alg, x_pred = stage_g(node, jnp.zeros((0,), w_vec.dtype),
                                          u, z, tvp, p, wk)
                    res.append(alg)
                    res.append(x_pred - node_next)
                    x_end, z_end = node_next, z[-n_z:] if n_z else z
                else:
                    r = stage_g(node, coll, u, z, tvp, p, wk)
                    res.append(r)
                    res.append(coll[-n_x:] - node_next)
                    x_end = node_next
                    z_end = z[-n_z:] if n_z else jnp.zeros((0,), w_vec.dtype)
                # measurement equality (reference :1144-1160)
                y_calc = model._meas_fun(x_end * xs, u * us, z_end * zs,
                                         tvp, p, vk)
                res.append(y_calc - y_meas)
                return jnp.concatenate(res)

            Node = w_vec[A["node"]]
            Coll = w_vec[A["coll"]] if n_coll else jnp.zeros(
                (N, 0), w_vec.dtype)
            U = w_vec[A["u"]] if n_u else jnp.zeros((N, 0), w_vec.dtype)
            Z = w_vec[A["z"]] if n_z else jnp.zeros((N, 0), w_vec.dtype)
            WK = w_vec[A["w"]] if n_w else jnp.zeros((N, 0), w_vec.dtype)
            VK = w_vec[A["v"]] if n_v else jnp.zeros((N, 0), w_vec.dtype)
            res = jax.vmap(stage_res)(Node, Coll, U, Z, WK, VK,
                                      pvec[A["tvp"]], pvec[A["y"]],
                                      w_vec[A["node_next"]])
            return res.reshape(-1)

        def h(w_vec, pvec):
            if n_nl == 0:
                return jnp.zeros((0,), w_vec.dtype)
            p_est = w_vec[p_est_idx] * pes
            p_set = pvec[psl["p_set"]]

            def stage_h(node, coll, u, z, eps, tvp):
                u_un = u * us
                if check_colloc:
                    outs = []
                    for i in range(n_coll):
                        xi = coll[i * n_x:(i + 1) * n_x] * xs
                        zi = (z[i * n_z:(i + 1) * n_z] * zs if n_z
                              else jnp.zeros((0,), w_vec.dtype))
                        outs.append(nl_cons_eval(xi, u_un, zi, tvp, p_est,
                                                 p_set, eps))
                    return jnp.concatenate(outs)
                z0 = (z[:n_z] * zs if n_z
                      else jnp.zeros((0,), w_vec.dtype))
                return nl_cons_eval(node * xs, u_un, z0, tvp, p_est,
                                    p_set, eps)

            Node = w_vec[A["node"]]
            Coll = w_vec[A["coll"]] if n_coll else jnp.zeros(
                (N, 0), w_vec.dtype)
            U = w_vec[A["u"]] if n_u else jnp.zeros((N, 0), w_vec.dtype)
            Z = w_vec[A["z"]] if n_z else jnp.zeros((N, 0), w_vec.dtype)
            EPS = w_vec[A["eps"]] if nev else jnp.zeros((N, 0), w_vec.dtype)
            res = jax.vmap(stage_h)(Node, Coll, U, Z, EPS, pvec[A["tvp"]])
            return res.reshape(-1)

        self._f_fn, self._g_fn, self._h_fn = f, g, h
        w_dummy = jnp.zeros((L.size,))
        p_dummy = jnp.zeros((self.n_opt_p,))
        self.n_opt_lagr = int(jax.eval_shape(g, w_dummy, p_dummy).shape[0])
        self._n_ineq = int(jax.eval_shape(h, w_dummy, p_dummy).shape[0])
        self.n_eps = nev * min(n_eps_rep, N)

        # ---- instance-local AD: one instance per stage (like MPC) ------
        # Variables of stage k gather into a small vector v_k; objective,
        # constraints and all derivatives are per-instance with scatter
        # assembly — the estimated parameters p_est ride along in every
        # instance and land in the BBD root border (the "bordered band"
        # structure of MHE parameter estimation).
        n = L.size
        n_pe = self.n_p_est
        seg_defs = [
            ("node", n_x), ("coll", n_coll * n_x), ("u", n_u),
            ("z", n_coll_z * n_z), ("w", n_w), ("v", n_v), ("eps", nev),
            ("node_next", n_x), ("p_est", n_pe),
        ]
        seg_sl = {}
        off2 = 0
        for name, size in seg_defs:
            seg_sl[name] = slice(off2, off2 + size)
            off2 += size
        d = off2

        def seg(vv, name):
            return vv[seg_sl[name]]

        A_all = np.zeros((N, d), dtype=int)
        A_all[:, seg_sl["node"]] = np.asarray(A["node"])
        if n_coll:
            A_all[:, seg_sl["coll"]] = np.asarray(A["coll"])
        if n_u:
            A_all[:, seg_sl["u"]] = np.asarray(A["u"])
        if n_z:
            A_all[:, seg_sl["z"]] = np.asarray(A["z"])
        if n_w:
            A_all[:, seg_sl["w"]] = np.asarray(A["w"])
        if n_v:
            A_all[:, seg_sl["v"]] = np.asarray(A["v"])
        if nev:
            A_all[:, seg_sl["eps"]] = np.asarray(A["eps"])
        A_all[:, seg_sl["node_next"]] = np.asarray(A["node_next"])
        if n_pe:
            A_all[:, seg_sl["p_est"]] = np.tile(
                np.asarray(L.idx(("p_est",))), (N, 1))
        self._A_all = A_all
        A_all_j = jnp.asarray(A_all)

        k0_mask = jnp.asarray(
            (np.arange(N) == 0).astype(float))

        def obj_i(vv, tvp, y, k0m, x_prev, p_est_prev, p_set):
            p_est = seg(vv, "p_est") * pes
            p = self._p_cat(p_est, p_set, xp=jnp)
            env = {
                "_w": model.spec("_w").unpack(seg(vv, "w"), xp=jnp),
                "_v": model.spec("_v").unpack(seg(vv, "v"), xp=jnp),
                "_tvp": model.spec("_tvp").unpack(tvp, xp=jnp),
                "_p": model.spec("_p").unpack(p, xp=jnp),
                "_p_est": self._p_est_spec.unpack(p_est, xp=jnp),
                "_p_set": self._p_set_spec.unpack(p_set, xp=jnp),
            }
            val = env_scalar(stage_cost, env)
            env_arr = {
                "_x": model.spec("_x").unpack(seg(vv, "node") * xs,
                                              xp=jnp),
                "_x_prev": model.spec("_x").unpack(x_prev, xp=jnp),
                "_p_est": env["_p_est"],
                "_p_est_prev": self._p_est_spec.unpack(p_est_prev,
                                                       xp=jnp),
                "_p_set": env["_p_set"],
                "_p": env["_p"],
            }
            val = val + k0m * env_scalar(arrival, env_arr)
            if nev:
                val = val + epsterm(seg(vv, "eps"))
            return val

        def g_i(vv, tvp, y, p_set):
            p_est = seg(vv, "p_est") * pes
            p = self._p_cat(p_est, p_set, xp=jnp)
            node = seg(vv, "node")
            coll = seg(vv, "coll")
            u = seg(vv, "u")
            z = seg(vv, "z")
            wk = seg(vv, "w")
            vk = seg(vv, "v")
            node_next = seg(vv, "node_next")
            res = []
            if model.model_type == "discrete":
                alg, x_pred = stage_g(node, jnp.zeros((0,), vv.dtype),
                                      u, z, tvp, p, wk)
                res.append(alg)
                res.append(x_pred - node_next)
                x_end = node_next
                z_end = z[-n_z:] if n_z else z
            else:
                r = stage_g(node, coll, u, z, tvp, p, wk)
                res.append(r)
                res.append(coll[-n_x:] - node_next)
                x_end = node_next
                z_end = z[-n_z:] if n_z else jnp.zeros((0,), vv.dtype)
            y_calc = model._meas_fun(x_end * xs, u * us, z_end * zs,
                                     tvp, p, vk)
            res.append(y_calc - y)
            return jnp.concatenate(res)

        def h_i(vv, tvp, p_set):
            p_est = seg(vv, "p_est") * pes
            node = seg(vv, "node")
            coll = seg(vv, "coll")
            u_un = seg(vv, "u") * us
            z = seg(vv, "z")
            eps = seg(vv, "eps")
            if check_colloc:
                outs = []
                for i in range(n_coll):
                    xi = coll[i * n_x:(i + 1) * n_x] * xs
                    zi = (z[i * n_z:(i + 1) * n_z] * zs if n_z
                          else jnp.zeros((0,), vv.dtype))
                    outs.append(nl_cons_eval(xi, u_un, zi, tvp, p_est,
                                             p_set, eps))
                return jnp.concatenate(outs)
            z0 = (z[:n_z] * zs if n_z else jnp.zeros((0,), vv.dtype))
            return nl_cons_eval(node * xs, u_un, z0, tvp, p_est, p_set,
                                eps)

        E = self.n_opt_lagr // N
        nlr = self._n_ineq // N if self._n_ineq else 0
        R_g = (np.arange(N)[:, None] * E + np.arange(E)[None, :])
        R_h = (np.arange(N)[:, None] * nlr + np.arange(nlr)[None, :]) \
            if nlr else np.zeros((N, 0), int)
        R_g_j = jnp.asarray(R_g)
        R_h_j = jnp.asarray(R_h)

        def parts(w_vec, pvec):
            V = w_vec[A_all_j]
            return (V, pvec[A["tvp"]], pvec[A["y"]],
                    pvec[psl["x_prev"]], pvec[psl["p_est_prev"]],
                    pvec[psl["p_set"]])

        d_obj = jax.grad(obj_i)
        d_g = jax.jacfwd(g_i)
        d_h = jax.jacfwd(h_i) if nlr else None

        def grad_f(w_vec, pvec):
            V, TVP, Y, xp_, pep_, ps_ = parts(w_vec, pvec)
            G = jax.vmap(d_obj,
                         in_axes=(0, 0, 0, 0, None, None, None))(
                V, TVP, Y, k0_mask, xp_, pep_, ps_)
            return jnp.zeros((n,), w_vec.dtype).at[
                A_all_j.reshape(-1)].add(G.reshape(-1))

        def jac_g(w_vec, pvec):
            V, TVP, Y, xp_, pep_, ps_ = parts(w_vec, pvec)
            Ji = jax.vmap(d_g, in_axes=(0, 0, 0, None))(V, TVP, Y, ps_)
            J = jnp.zeros((self.n_opt_lagr, n), w_vec.dtype)
            return J.at[R_g_j[:, :, None], A_all_j[:, None, :]].add(Ji)

        def jac_h(w_vec, pvec):
            V, TVP, Y, xp_, pep_, ps_ = parts(w_vec, pvec)
            Ji = jax.vmap(d_h, in_axes=(0, 0, None))(V, TVP, ps_)
            J = jnp.zeros((self._n_ineq, n), w_vec.dtype)
            return J.at[R_h_j[:, :, None], A_all_j[:, None, :]].add(Ji)

        def lag_i(vv, tvp, y, k0m, xp_, pep_, ps_, lam_gi, lam_hi):
            val = obj_i(vv, tvp, y, k0m, xp_, pep_, ps_)
            val = val + jnp.dot(lam_gi, g_i(vv, tvp, y, ps_))
            if nlr:
                val = val + jnp.dot(lam_hi, h_i(vv, tvp, ps_))
            return val

        d2_lag = jax.hessian(lag_i)

        def hess_fn(w_vec, pvec, lam_g, lam_h):
            V, TVP, Y, xp_, pep_, ps_ = parts(w_vec, pvec)
            Lg = lam_g[R_g_j]
            Lh = lam_h[R_h_j] if nlr else jnp.zeros((N, 0), w_vec.dtype)
            Hi = jax.vmap(
                d2_lag,
                in_axes=(0, 0, 0, 0, None, None, None, 0, 0))(
                V, TVP, Y, k0_mask, xp_, pep_, ps_, Lg, Lh)
            H = jnp.zeros((n, n), w_vec.dtype)
            return H.at[A_all_j[:, :, None], A_all_j[:, None, :]].add(Hi)

        self._grad_f_fn, self._jac_g_fn, self._jac_h_fn = (grad_f, jac_g,
                                                           jac_h)
        self._hess_fn = hess_fn
        self._struct_parts = dict(
            parts=parts, d_g=d_g, d_h=d_h, d2_lag=d2_lag, R_g=R_g,
            R_h=R_h, R_g_j=R_g_j, R_h_j=R_h_j, k0_mask=k0_mask, nlr=nlr,
            E=E, d=d, N=N)

    def _make_structured_solve(self, delta_cons, n_refine=1):
        """Bordered-band KKT backend for MHE: a single stage chain with
        the estimated parameters (and single-slack eps) in the BBD root
        (reference hands this sparsity to IPOPT, estimator/_mhe.py:1251;
        p_est couples every stage, which is exactly the arrowhead border
        solver/bbd.py factorizes)."""
        from ..solver.bbd import BBDAssembler, bbd_solve, demote_by_usage
        sp = self._struct_parts
        L = self.layout
        N = sp["N"]
        E, nlr = sp["E"], sp["nlr"]
        m, q = self.n_opt_lagr, self._n_ineq

        var_chain = np.zeros(L.size, int)
        var_stage = np.zeros(L.size, int)
        for key in L.offsets:
            var_stage[L.sl(key)] = min(L.stage_of[key], N)
        inst_chain = np.zeros(N, int)
        inst_stage = np.arange(N)
        var_chain, var_stage = demote_by_usage(
            var_chain, var_stage, self._A_all, L.size, inst_chain,
            inst_stage)
        g_chain = np.repeat(inst_chain, E)
        g_stage = np.repeat(inst_stage, E)
        h_chain = np.repeat(inst_chain, nlr)
        h_stage = np.repeat(inst_stage, nlr)
        assembler = BBDAssembler(
            var_chain, var_stage, g_chain, g_stage, h_chain, h_stage,
            self._A_all, sp["R_g"], sp["R_h"], self.n_opt_x, m, q,
            init_cols=None)
        self._kkt_structure = assembler

        parts = sp["parts"]
        d_g, d_h, d2_lag = sp["d_g"], sp["d_h"], sp["d2_lag"]
        R_g_j, R_h_j = sp["R_g_j"], sp["R_h_j"]
        k0_mask = sp["k0_mask"]
        nlr_ = nlr
        diag_i = jnp.arange(assembler.b)
        diag_r = jnp.arange(assembler.R)
        mask_c = jnp.asarray(assembler.w_mask_chain)
        mask_r = jnp.asarray(assembler.w_mask_root)
        accel = jax.default_backend() == "tpu"

        def prepare(w_vec, pvec, lam_g, lam_h, sig_w, inv_sig_s):
            V, TVP, Y, xp_, pep_, ps_ = parts(w_vec, pvec)
            Lg = lam_g[R_g_j]
            Lh = lam_h[R_h_j] if nlr_ else jnp.zeros((sp["N"], 0),
                                                     w_vec.dtype)
            Hi = jax.vmap(
                d2_lag,
                in_axes=(0, 0, 0, 0, None, None, None, 0, 0))(
                V, TVP, Y, k0_mask, xp_, pep_, ps_, Lg, Lh)
            Jg_i = jax.vmap(d_g, in_axes=(0, 0, 0, None))(V, TVP, Y, ps_)
            Jh_i = (jax.vmap(d_h, in_axes=(0, 0, None))(V, TVP, ps_)
                    if nlr_ else jnp.zeros((sp["N"], 0, sp["d"]),
                                           w_vec.dtype))
            return assembler.assemble(
                Hi, Jg_i, Jh_i, sig_w,
                -delta_cons * jnp.ones((m,), w_vec.dtype),
                -inv_sig_s - delta_cons)

        def solve(ctx, r_dw, r_g, r_h_mod, delta):
            D, U, Lo, Bord, Root = ctx
            dtype = r_dw.dtype
            D = D.at[:, :, diag_i, diag_i].add(
                delta * jnp.asarray(mask_c, dtype))
            if assembler.R:
                Root = Root.at[diag_r, diag_r].add(
                    delta * jnp.asarray(mask_r, dtype))
            rhs_c, rhs_r = assembler.pack_rhs(-r_dw, -r_g, -r_h_mod)
            n_ref = 0 if dtype == jnp.float32 else n_refine
            x_c, x_r = bbd_solve(D, U, Lo, Bord, Root, rhs_c, rhs_r,
                                 n_refine=n_ref, accel=accel)
            return assembler.unpack_sol(x_c, x_r)

        return prepare, solve

    def _create_solver(self):
        st = self.settings
        ipm_settings = ipm_settings_from(st)
        use_structured = (getattr(st, "kkt_solver", "auto") == "tridiag"
                          or (getattr(st, "kkt_solver", "auto") == "auto"
                              and self.n_opt_x > 600
                              and st.n_horizon >= 4))
        structured_solve = None
        if use_structured:
            structured_solve = self._make_structured_solve(
                ipm_settings.delta_cons)
        solve = make_ipm_solver(
            self._f_fn, self._g_fn, self._h_fn,
            self._lb_opt_x, self._ub_opt_x,
            self.n_opt_lagr, self._n_ineq, settings=ipm_settings,
            hess_fn=self._hess_fn, grad_f_fn=self._grad_f_fn,
            jac_g_fn=self._jac_g_fn,
            jac_h_fn=self._jac_h_fn if self._n_ineq else None,
            structured_solve=structured_solve)
        self._solve_jit = jax.jit(solve)
        from ..tools._optxview import make_mhe_resolver
        self._optx_resolver = make_mhe_resolver(self)
        self.opt_x_num = np.zeros(self.n_opt_x)
        self.opt_p_num = np.zeros(self.n_opt_p)
        self.lam_g_num = np.zeros(self.n_opt_lagr + self._n_ineq)

    def _prepare_data(self):
        self.data.data_fields.update({"_eps": self.n_eps})
        if self.settings.store_full_solution:
            self.data.data_fields.update({"_opt_x_num": self.n_opt_x})
        if self.settings.store_lagr_multiplier:
            self.data.data_fields.update(
                {"_lam_g_num": self.n_opt_lagr + self._n_ineq})
        for stat in self.settings.store_solver_stats:
            self.data.data_fields.update({stat: 1})
        self.data.init_storage()

    # ------------------------------------------------------------ runtime
    def reset_history(self):
        """Clear logged data and reset time (reference API)."""
        self._t0 = np.array([0.0])
        self.data.init_storage()

    def set_initial_guess(self):
        assert self.flags["setup"], "MHE was not setup yet."
        L = self.layout
        w = self.opt_x_num
        x0s = self._x0.data / self._x_scaling.data
        for key in L.offsets:
            kind = key[0]
            if kind == "x_node":
                w[L.sl(key)] = x0s
            elif kind == "x_coll":
                w[L.sl(key)] = np.tile(x0s, len(L.idx(key)) // len(x0s))
            elif kind == "u":
                w[L.sl(key)] = self._u0.data / self._u_scaling.data
            elif kind == "z":
                nrep = len(L.idx(key)) // max(self.model.n_z, 1)
                w[L.sl(key)] = np.tile(
                    self._z0.data / self._z_scaling.data, nrep)
            elif kind == "p_est":
                w[L.sl(key)] = self._p_est0.data / self._p_est_scaling.data
            else:
                w[L.sl(key)] = 0.0
        self.flags["set_initial_guess"] = True

    def _num(self, v):
        if isinstance(v, NumStruct):
            return v.data
        if hasattr(v, "array"):
            return np.asarray(v.array(), dtype=float)
        return np.asarray(v, dtype=float)

    def solve(self):
        t_start = _time.perf_counter()
        self._n_solves = getattr(self, "_n_solves", 0) + 1
        with profiler.step_annotation("dompc_tpu.MHE.solve",
                                      self._n_solves):
            if self.flags["initial_run"]:
                sol = self._solve_jit(
                    jnp.asarray(self.opt_x_num), jnp.asarray(self.opt_p_num),
                    jnp.asarray(self._lam_warm),
                    jnp.asarray(self.settings.warm_start_mu),
                    jnp.asarray(self._zl_warm), jnp.asarray(self._zu_warm))
            else:
                sol = self._solve_jit(
                    jnp.asarray(self.opt_x_num), jnp.asarray(self.opt_p_num))
        self.opt_x_num = np.array(sol.w)
        self.opt_x_num_unscaled = self.opt_x_num * self.opt_x_scaling
        self._lam_warm = np.asarray(sol.lam)
        self._zl_warm = np.asarray(sol.zl)
        self._zu_warm = np.asarray(sol.zu)
        self.lam_g_num = np.asarray(sol.lam)
        self.solver_stats = {
            "success": bool(sol.success),
            "iter_count": int(sol.iterations),
            "t_wall_total": _time.perf_counter() - t_start,
            "kkt_err": float(sol.kkt_err),
        }
        self.flags["initial_run"] = True

    def make_step(self, y0) -> np.ndarray:
        """Estimation step (reference: _mhe.py:896-993)."""
        assert self.flags["setup"], "MHE was not setup yet."
        model = self.model
        y0 = np.asarray(y0, dtype=float).reshape(-1)
        assert y0.size == model.n_y
        if not self.flags["set_initial_guess"]:
            warnings.warn("Initial guess for the MHE was not set.")
            self.flags["set_initial_guess"] = True

        self.data.update(_y=y0)
        L = self.layout
        psl = self._p_sl
        t0 = self._t0
        xs = self._x_scaling.data
        tvp_arr = self._eval_tvp(t0)
        p_set0 = self._num(self.p_fun(float(t0[0]))).reshape(-1)
        y_traj = self._num(self.y_fun(float(t0[0])))

        pvec = np.zeros(self.n_opt_p)
        if self.flags["initial_run"]:
            # shifted arrival point from the previous solution (ref :945)
            pvec[psl["x_prev"]] = self.opt_x_num[
                L.sl(("x_node", 1, 0))] * xs
        else:
            pvec[psl["x_prev"]] = self._x0.data
        pvec[psl["p_est_prev"]] = self._p_est0.data
        pvec[psl["p_set"]] = p_set0
        if model.n_tvp:
            pvec[psl["tvp"]] = tvp_arr.reshape(-1)
        pvec[psl["y_meas"]] = y_traj.reshape(-1)
        self.opt_p_num = pvec

        self.solve()

        N = self.settings.n_horizon
        x_next = self.opt_x_num[L.sl(("x_node", N, 0))] * xs
        p_est_next = (self.opt_x_num[L.sl(("p_est",))]
                      * self._p_est_scaling.data if self.n_p_est
                      else np.zeros(0))
        u0 = (self.opt_x_num[L.sl(("u", N - 1, 0))]
              * self._u_scaling.data if model.n_u else np.zeros(0))
        z0 = (self.opt_x_num[L.idx(("z", N - 1, 0))[-model.n_z:]]
              * self._z_scaling.data if model.n_z else np.zeros(0))
        p0 = self._p_cat(self._p_est0.data, p_set0)

        self.data.update(_x=self._x0.data)
        self.data.update(_u=u0)
        self.data.update(_z=z0)
        self.data.update(_p=p0)
        if model.n_tvp:
            self.data.update(_tvp=tvp_arr[-1])
        self.data.update(_time=t0)
        if self.settings.store_full_solution:
            self.data.update(_opt_x_num=self.opt_x_num_unscaled)
        if self.settings.store_lagr_multiplier:
            self.data.update(_lam_g_num=self.lam_g_num)
        stats_row = {k: v for k, v in self.solver_stats.items()
                     if k in self.settings.store_solver_stats}
        if stats_row:
            self.data.update(**{k: float(v) for k, v in stats_row.items()})

        self._t0 = self._t0 + self.settings.t_step
        self._x0.data[:] = x_next
        if self.n_p_est:
            self._p_est0.data[:] = p_est_next
        if model.n_u:
            self._u0.data[:] = u0
        if model.n_z:
            self._z0.data[:] = z0
        return x_next.reshape(-1, 1)
