"""Lightweight closure-based expression layer.

Replaces CasADi SX/MX symbolic graphs (reference: do_mpc/tools/_casstructure.py,
do_mpc/model/_model.py:537-670) with deferred JAX computations: a :class:`Sym`
wraps a function ``env -> jnp.ndarray`` where ``env`` is a nested dict
``{var_type: {var_name: array}}``.  Arithmetic on :class:`Sym` objects composes
closures; evaluation happens under ``jax.jit`` tracing, so autodiff, vmap and
XLA fusion come for free — there is no interpreter and no graph data structure.

The module-level math functions mirror the CasADi names users of the reference
know (``exp``, ``sum1``, ``vertcat``, ``fmax`` ...), operating on Sym or plain
arrays.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "Sym", "var", "const", "to_sym", "is_sym",
    "exp", "log", "log10", "sin", "cos", "tan", "tanh", "sinh", "cosh",
    "arcsin", "arccos", "arctan", "atan", "atan2", "sqrt", "fabs", "sign",
    "fmin", "fmax", "floor", "ceil", "power", "if_else", "logic_and",
    "logic_or", "sum1", "sum2", "sumsqr", "norm_1", "norm_2", "dot", "mtimes",
    "vertcat", "horzcat", "blockcat", "reshape", "transpose", "diag", "trace",
    "inv", "sigmoid", "erf",
]


def _as_callable(v):
    if isinstance(v, Sym):
        return v.fn
    arr = v if isinstance(v, (int, float)) else np.asarray(v)
    return lambda env, _c=arr: _c


def to_sym(v) -> "Sym":
    return v if isinstance(v, Sym) else Sym(_as_callable(v))


def is_sym(v) -> bool:
    return isinstance(v, Sym)


class Sym:
    """A deferred expression: ``self.fn(env)`` returns a jnp array.

    ``env`` is ``{'_x': {...}, '_u': {...}, '_z': {...}, '_p': {...},
    '_tvp': {...}, '_w': {...}, '_v': {...}}`` (only the groups an expression
    actually reads need to be present).
    """

    __slots__ = ("fn", "name")
    __array_priority__ = 1000  # make numpy defer to our __radd__ etc.

    def __init__(self, fn, name: str | None = None):
        self.fn = fn
        self.name = name

    def __call__(self, env):
        return self.fn(env)

    # -- binary ops ---------------------------------------------------------
    def _bin(self, other, op):
        f, g = self.fn, _as_callable(other)
        return Sym(lambda env: op(f(env), g(env)))

    def _rbin(self, other, op):
        f, g = self.fn, _as_callable(other)
        return Sym(lambda env: op(g(env), f(env)))

    def __add__(self, o): return self._bin(o, jnp.add)
    def __radd__(self, o): return self._rbin(o, jnp.add)
    def __sub__(self, o): return self._bin(o, jnp.subtract)
    def __rsub__(self, o): return self._rbin(o, jnp.subtract)
    def __mul__(self, o): return self._bin(o, jnp.multiply)
    def __rmul__(self, o): return self._rbin(o, jnp.multiply)
    def __truediv__(self, o): return self._bin(o, jnp.divide)
    def __rtruediv__(self, o): return self._rbin(o, jnp.divide)
    def __pow__(self, o): return self._bin(o, jnp.power)
    def __rpow__(self, o): return self._rbin(o, jnp.power)
    def __matmul__(self, o): return self._bin(o, _matmul)
    def __rmatmul__(self, o): return self._rbin(o, _matmul)
    def __neg__(self):
        f = self.fn
        return Sym(lambda env: -f(env))
    def __pos__(self):
        return self

    # comparisons produce Syms too (useful with if_else)
    def __lt__(self, o): return self._bin(o, jnp.less)
    def __le__(self, o): return self._bin(o, jnp.less_equal)
    def __gt__(self, o): return self._bin(o, jnp.greater)
    def __ge__(self, o): return self._bin(o, jnp.greater_equal)

    def __getitem__(self, idx):
        f = self.fn
        return Sym(lambda env: f(env)[idx])

    @property
    def T(self):
        f = self.fn
        return Sym(lambda env: jnp.transpose(f(env)))

    def reshape(self, shape):
        f = self.fn
        return Sym(lambda env: jnp.reshape(f(env), shape))

    def __repr__(self):
        return f"Sym({self.name or '<expr>'})"


def _matmul(a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    return a @ b


def var(var_type: str, name: str) -> Sym:
    """A Sym reading ``env[var_type][name]``."""
    return Sym(lambda env: env[var_type][name], name=f"{var_type}.{name}")


def const(v) -> Sym:
    return to_sym(v)


# -- elementwise math -------------------------------------------------------

def _unary(op):
    def f(x):
        if isinstance(x, Sym):
            g = x.fn
            return Sym(lambda env: op(g(env)))
        return op(x)
    return f


exp = _unary(jnp.exp)
log = _unary(jnp.log)
log10 = _unary(jnp.log10)
sin = _unary(jnp.sin)
cos = _unary(jnp.cos)
tan = _unary(jnp.tan)
tanh = _unary(jnp.tanh)
sinh = _unary(jnp.sinh)
cosh = _unary(jnp.cosh)
arcsin = _unary(jnp.arcsin)
arccos = _unary(jnp.arccos)
arctan = _unary(jnp.arctan)
atan = arctan
sqrt = _unary(jnp.sqrt)
fabs = _unary(jnp.abs)
sign = _unary(jnp.sign)
floor = _unary(jnp.floor)
ceil = _unary(jnp.ceil)
sigmoid = _unary(jax.nn.sigmoid)
erf = _unary(jax.scipy.special.erf)
transpose = _unary(jnp.transpose)
diag = _unary(jnp.diag)
trace = _unary(jnp.trace)
inv = _unary(jnp.linalg.inv)


def _binary(op):
    def f(a, b):
        if isinstance(a, Sym) or isinstance(b, Sym):
            fa, fb = _as_callable(a), _as_callable(b)
            return Sym(lambda env: op(fa(env), fb(env)))
        return op(a, b)
    return f


fmin = _binary(jnp.minimum)
fmax = _binary(jnp.maximum)
power = _binary(jnp.power)
atan2 = _binary(jnp.arctan2)
mtimes = _binary(_matmul)
logic_and = _binary(jnp.logical_and)
logic_or = _binary(jnp.logical_or)


def dot(a, b):
    fa, fb = _as_callable(a), _as_callable(b)
    return Sym(lambda env: jnp.sum(jnp.ravel(fa(env)) * jnp.ravel(fb(env))))


def if_else(cond, if_true, if_false):
    fc, ft, ff = _as_callable(cond), _as_callable(if_true), _as_callable(if_false)
    return Sym(lambda env: jnp.where(fc(env), ft(env), ff(env)))


# -- reductions (CasADi semantics: sum1 = sum over rows/elements) -----------

def sum1(x):
    f = _as_callable(x)
    return Sym(lambda env: jnp.sum(f(env), axis=0) if jnp.ndim(f(env)) > 1
               else jnp.sum(f(env)))


def sum2(x):
    f = _as_callable(x)
    return Sym(lambda env: jnp.sum(f(env), axis=-1))


def sumsqr(x):
    f = _as_callable(x)
    return Sym(lambda env: jnp.sum(jnp.square(f(env))))


def norm_1(x):
    f = _as_callable(x)
    return Sym(lambda env: jnp.sum(jnp.abs(f(env))))


def norm_2(x):
    f = _as_callable(x)
    return Sym(lambda env: jnp.sqrt(jnp.sum(jnp.square(f(env)))))


# -- concatenation ----------------------------------------------------------

def _ravel1(v):
    v = jnp.asarray(v)
    return jnp.atleast_1d(v) if v.ndim <= 1 else v.reshape(-1, order="F") \
        if False else v  # matrices stay 2-D; see vertcat below


def vertcat(*args):
    fns = [_as_callable(a) for a in args]

    def f(env):
        vals = [jnp.asarray(fn(env)) for fn in fns]
        if any(v.ndim > 1 for v in vals):
            vals = [v if v.ndim > 1 else jnp.reshape(v, (-1, 1)) for v in vals]
            return jnp.concatenate(vals, axis=0)
        vals = [jnp.atleast_1d(v) for v in vals]
        return jnp.concatenate(vals)
    return Sym(f)


def horzcat(*args):
    fns = [_as_callable(a) for a in args]

    def f(env):
        vals = [jnp.atleast_2d(jnp.asarray(fn(env))) for fn in fns]
        return jnp.concatenate(vals, axis=1)
    return Sym(f)


def blockcat(rows):
    row_syms = [horzcat(*r) for r in rows]
    return vertcat(*row_syms)


def reshape(x, shape):
    f = _as_callable(x)
    return Sym(lambda env: jnp.reshape(f(env), shape))
