"""Lightweight closure-based expression layer with a picklable op-tree.

Replaces CasADi SX/MX symbolic graphs (reference: do_mpc/tools/_casstructure.py,
do_mpc/model/_model.py:537-670) with deferred JAX computations: a :class:`Sym`
wraps a function ``env -> jnp.ndarray`` where ``env`` is a nested dict
``{var_type: {var_name: array}}``.  Arithmetic on :class:`Sym` objects composes
closures; evaluation happens under ``jax.jit`` tracing, so autodiff, vmap and
XLA fusion come for free — there is no interpreter in the hot path.

Alongside the closure, every constructor records a small *op tree* (nested
tuples of op names and leaf payloads).  The tree is what pickles: on unpickle
the closure is rebuilt by one recursive pass (reference pickles SX models,
model/_model.py:130-161; here every Sym built from this module's operations
round-trips).  Syms wrapping raw user closures carry no tree and refuse to
pickle — the analogue of the reference's MX-pickling limitation.

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


def _matmul(a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    return a @ b


def _sum1(v):
    return jnp.sum(v, axis=0) if jnp.ndim(v) > 1 else jnp.sum(v)


def _vertcat(*vals):
    vals = [jnp.asarray(v) for v in vals]
    if any(v.ndim > 1 for v in vals):
        vals = [v if v.ndim > 1 else jnp.reshape(v, (-1, 1)) for v in vals]
        return jnp.concatenate(vals, axis=0)
    return jnp.concatenate([jnp.atleast_1d(v) for v in vals])


def _horzcat(*vals):
    return jnp.concatenate([jnp.atleast_2d(jnp.asarray(v)) for v in vals],
                           axis=1)


def _dot(a, b):
    return jnp.sum(jnp.ravel(a) * jnp.ravel(b))


_UNARY = {
    "neg": jnp.negative, "exp": jnp.exp, "log": jnp.log,
    "log10": jnp.log10, "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "tanh": jnp.tanh, "sinh": jnp.sinh, "cosh": jnp.cosh,
    "arcsin": jnp.arcsin, "arccos": jnp.arccos, "arctan": jnp.arctan,
    "sqrt": jnp.sqrt, "fabs": jnp.abs, "sign": jnp.sign,
    "floor": jnp.floor, "ceil": jnp.ceil, "sigmoid": jax.nn.sigmoid,
    "erf": jax.scipy.special.erf, "transpose": jnp.transpose,
    "diag": jnp.diag, "trace": jnp.trace, "inv": jnp.linalg.inv,
    "sum1": _sum1, "sum2": lambda v: jnp.sum(v, axis=-1),
    "sumsqr": lambda v: jnp.sum(jnp.square(v)),
    "norm_1": lambda v: jnp.sum(jnp.abs(v)),
    "norm_2": lambda v: jnp.sqrt(jnp.sum(jnp.square(v))),
}

_BINARY = {
    "add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
    "div": jnp.divide, "pow": jnp.power, "matmul": _matmul,
    "lt": jnp.less, "le": jnp.less_equal, "gt": jnp.greater,
    "ge": jnp.greater_equal, "fmin": jnp.minimum, "fmax": jnp.maximum,
    "atan2": jnp.arctan2, "logic_and": jnp.logical_and,
    "logic_or": jnp.logical_or, "dot": _dot,
}

_NARY = {
    "vertcat": _vertcat, "horzcat": _horzcat,
    "if_else": lambda c, t, f: jnp.where(c, t, f),
}


def _tree_of(v):
    if isinstance(v, Sym):
        return v.tree
    return ("const", v if isinstance(v, (int, float)) else np.asarray(v))


def _build(tree):
    """Rebuild the evaluation closure from a pickled op tree."""
    tag = tree[0]
    if tag == "const":
        c = tree[1]
        return lambda env: c
    if tag == "var":
        vt, name = tree[1], tree[2]
        return lambda env: env[vt][name]
    if tag == "pack":
        vt, names, shapes = tree[1], tree[2], tree[3]
        def pack(env):
            parts = []
            for name, shape in zip(names, shapes):
                v = jnp.asarray(env[vt][name])
                parts.append(jnp.reshape(v.T, (-1,)) if v.ndim > 1
                             else jnp.reshape(v, (-1,)))
            if not parts:
                return jnp.zeros((0,))
            return jnp.concatenate(parts)
        return pack
    if tag == "u":
        op, f = _UNARY[tree[1]], _build(tree[2])
        return lambda env: op(f(env))
    if tag == "b":
        op = _BINARY[tree[1]]
        fa, fb = _build(tree[2]), _build(tree[3])
        return lambda env: op(fa(env), fb(env))
    if tag == "n":
        op = _NARY[tree[1]]
        fns = [_build(t) for t in tree[2:]]
        return lambda env: op(*[f(env) for f in fns])
    if tag == "getitem":
        f, idx = _build(tree[1]), tree[2]
        return lambda env: f(env)[idx]
    if tag == "reshape":
        f, shape = _build(tree[1]), tree[2]
        return lambda env: jnp.reshape(f(env), shape)
    raise ValueError(f"unknown op-tree tag {tag!r}")


def _from_tree(tree, name=None):
    return Sym(_build(tree), name=name, tree=tree)


def _as_callable(v):
    if isinstance(v, Sym):
        return v.fn
    arr = v if isinstance(v, (int, float)) else np.asarray(v)
    return lambda env, _c=arr: _c


def to_sym(v) -> "Sym":
    if isinstance(v, Sym):
        return v
    return Sym(_as_callable(v), tree=_tree_of(v))


def is_sym(v) -> bool:
    return isinstance(v, Sym)


class Sym:
    """A deferred expression: ``self.fn(env)`` returns a jnp array.

    ``env`` is ``{'_x': {...}, '_u': {...}, '_z': {...}, '_p': {...},
    '_tvp': {...}, '_w': {...}, '_v': {...}}`` (only the groups an expression
    actually reads need to be present).  ``tree`` is the picklable op-tree
    recipe, or None for raw user closures (which then cannot pickle).
    """

    __slots__ = ("fn", "name", "tree")
    __array_priority__ = 1000  # make numpy defer to our __radd__ etc.

    def __init__(self, fn, name: str | None = None, tree=None):
        self.fn = fn
        self.name = name
        self.tree = tree

    def __call__(self, env):
        return self.fn(env)

    def __reduce__(self):
        if self.tree is None:
            raise TypeError(
                "cannot pickle a Sym wrapping a raw closure; build "
                "expressions from dompc_tpu.sym operations to keep them "
                "serializable (reference limitation analogue: MX models "
                "do not pickle, do_mpc/model/_model.py:130-161)")
        return (_from_tree, (self.tree, self.name))

    # -- binary ops ---------------------------------------------------------
    def _bin(self, other, opname):
        f, g = self.fn, _as_callable(other)
        op = _BINARY[opname]
        return Sym(lambda env: op(f(env), g(env)),
                   tree=_maybe(("b", opname, self.tree, _tree_of(other))))

    def _rbin(self, other, opname):
        f, g = self.fn, _as_callable(other)
        op = _BINARY[opname]
        return Sym(lambda env: op(g(env), f(env)),
                   tree=_maybe(("b", opname, _tree_of(other), self.tree)))

    def __add__(self, o): return self._bin(o, "add")
    def __radd__(self, o): return self._rbin(o, "add")
    def __sub__(self, o): return self._bin(o, "sub")
    def __rsub__(self, o): return self._rbin(o, "sub")
    def __mul__(self, o): return self._bin(o, "mul")
    def __rmul__(self, o): return self._rbin(o, "mul")
    def __truediv__(self, o): return self._bin(o, "div")
    def __rtruediv__(self, o): return self._rbin(o, "div")
    def __pow__(self, o): return self._bin(o, "pow")
    def __rpow__(self, o): return self._rbin(o, "pow")
    def __matmul__(self, o): return self._bin(o, "matmul")
    def __rmatmul__(self, o): return self._rbin(o, "matmul")

    def __neg__(self):
        f = self.fn
        return Sym(lambda env: -f(env), tree=_maybe(("u", "neg", self.tree)))

    def __pos__(self):
        return self

    # comparisons produce Syms too (useful with if_else)
    def __lt__(self, o): return self._bin(o, "lt")
    def __le__(self, o): return self._bin(o, "le")
    def __gt__(self, o): return self._bin(o, "gt")
    def __ge__(self, o): return self._bin(o, "ge")

    def __getitem__(self, idx):
        f = self.fn
        return Sym(lambda env: f(env)[idx],
                   tree=_maybe(("getitem", self.tree, idx)))

    @property
    def T(self):
        f = self.fn
        return Sym(lambda env: jnp.transpose(f(env)),
                   tree=_maybe(("u", "transpose", self.tree)))

    def reshape(self, shape):
        f = self.fn
        return Sym(lambda env: jnp.reshape(f(env), shape),
                   tree=_maybe(("reshape", self.tree, shape)))

    def __repr__(self):
        return f"Sym({self.name or '<expr>'})"


def _maybe(tree):
    """A tree is valid only if every Sym operand carried one: operand
    subtrees are the only elements that can be None (``_tree_of`` always
    yields a tree for non-Sym values)."""
    return None if any(t is None for t in tree) else tree


def var(var_type: str, name: str) -> Sym:
    """A Sym reading ``env[var_type][name]``."""
    return Sym(lambda env: env[var_type][name], name=f"{var_type}.{name}",
               tree=("var", var_type, name))


def pack_var(var_type: str, names, shapes) -> Sym:
    """Concatenation of a whole variable group (SymView.cat)."""
    tree = ("pack", var_type, tuple(names), tuple(shapes))
    return Sym(_build(tree), name=f"{var_type}.cat", tree=tree)


def const(v) -> Sym:
    return to_sym(v)


# -- elementwise math -------------------------------------------------------

def _unary(opname):
    op = _UNARY[opname]

    def f(x):
        if isinstance(x, Sym):
            g = x.fn
            return Sym(lambda env: op(g(env)),
                       tree=_maybe(("u", opname, x.tree)))
        return op(x)
    return f


exp = _unary("exp")
log = _unary("log")
log10 = _unary("log10")
sin = _unary("sin")
cos = _unary("cos")
tan = _unary("tan")
tanh = _unary("tanh")
sinh = _unary("sinh")
cosh = _unary("cosh")
arcsin = _unary("arcsin")
arccos = _unary("arccos")
arctan = _unary("arctan")
atan = arctan
sqrt = _unary("sqrt")
fabs = _unary("fabs")
sign = _unary("sign")
floor = _unary("floor")
ceil = _unary("ceil")
sigmoid = _unary("sigmoid")
erf = _unary("erf")
transpose = _unary("transpose")
diag = _unary("diag")
trace = _unary("trace")
inv = _unary("inv")


def _binary(opname):
    op = _BINARY[opname]

    def f(a, b):
        if isinstance(a, Sym) or isinstance(b, Sym):
            fa, fb = _as_callable(a), _as_callable(b)
            return Sym(lambda env: op(fa(env), fb(env)),
                       tree=_maybe(("b", opname, _tree_of(a), _tree_of(b))))
        return op(a, b)
    return f


fmin = _binary("fmin")
fmax = _binary("fmax")
power = _binary("pow")
atan2 = _binary("atan2")
mtimes = _binary("matmul")
logic_and = _binary("logic_and")
logic_or = _binary("logic_or")


def dot(a, b):
    fa, fb = _as_callable(a), _as_callable(b)
    return Sym(lambda env: _dot(fa(env), fb(env)),
               tree=_maybe(("b", "dot", _tree_of(a), _tree_of(b))))


def if_else(cond, if_true, if_false):
    fc, ft, ff = (_as_callable(cond), _as_callable(if_true),
                  _as_callable(if_false))
    return Sym(lambda env: jnp.where(fc(env), ft(env), ff(env)),
               tree=_maybe(("n", "if_else", _tree_of(cond),
                            _tree_of(if_true), _tree_of(if_false))))


# -- reductions (CasADi semantics: sum1 = sum over rows/elements) -----------

def _reduction(opname):
    op = _UNARY[opname]

    def f(x):
        g = _as_callable(x)
        return Sym(lambda env: op(g(env)),
                   tree=_maybe(("u", opname, _tree_of(x))))
    return f


sum1 = _reduction("sum1")
sum2 = _reduction("sum2")
sumsqr = _reduction("sumsqr")
norm_1 = _reduction("norm_1")
norm_2 = _reduction("norm_2")


# -- concatenation ----------------------------------------------------------

def vertcat(*args):
    fns = [_as_callable(a) for a in args]
    return Sym(lambda env: _vertcat(*[fn(env) for fn in fns]),
               tree=_maybe(("n", "vertcat") + tuple(
                   _tree_of(a) for a in args)))


def horzcat(*args):
    fns = [_as_callable(a) for a in args]
    return Sym(lambda env: _horzcat(*[fn(env) for fn in fns]),
               tree=_maybe(("n", "horzcat") + tuple(
                   _tree_of(a) for a in args)))


def blockcat(rows):
    row_syms = [horzcat(*r) for r in rows]
    return vertcat(*row_syms)


def reshape(x, shape):
    f = _as_callable(x)
    return Sym(lambda env: jnp.reshape(f(env), shape),
               tree=_maybe(("reshape", _tree_of(x), shape)))
