"""ONNX graph -> JAX expression walker.

Re-design of ``do_mpc/sysid/_onnxconversion.py:10-424``: the reference walks
an ONNX graph node-by-node re-expressing every op in CasADi; here each op
becomes a jnp computation on :class:`~dompc_tpu.sym.Sym`-compatible traced
arrays, so converted networks drop straight into model right-hand sides.
Supported ops mirror the reference set (ONNXOperations, ref :305-419).
"""
from __future__ import annotations

import numpy as np

try:
    import onnx
    from onnx import numpy_helper
    _HAS_ONNX = True
except ImportError:  # pragma: no cover - gated in dompc_tpu.__init__
    _HAS_ONNX = False

import jax.numpy as jnp

from ..sym import Sym, to_sym


class ONNXOperations:
    """Each method evaluates one ONNX op on jnp values (reference :305)."""

    def Tanh(self, x, attribute=None):
        return jnp.tanh(x)

    def Sigmoid(self, x, attribute=None):
        return 1.0 / (1.0 + jnp.exp(-x))

    def Relu(self, x, attribute=None):
        return jnp.maximum(x, 0.0)

    def Elu(self, x, attribute=None):
        alpha = 1.0
        if attribute:
            for a in attribute:
                if a.name == "alpha":
                    alpha = a.f
        return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))

    def MatMul(self, a, b, attribute=None):
        return jnp.matmul(a, b)

    def Add(self, *args, attribute=None):
        out = args[0]
        for a in args[1:]:
            out = out + a
        return out

    def Mul(self, a, b, attribute=None):
        return a * b

    def Sub(self, a, b, attribute=None):
        return a - b

    def Gemm(self, a, b, c=None, attribute=None):
        alpha, beta, transA, transB = 1.0, 1.0, 0, 0
        if attribute:
            for at in attribute:
                if at.name == "alpha":
                    alpha = at.f
                elif at.name == "beta":
                    beta = at.f
                elif at.name == "transA":
                    transA = at.i
                elif at.name == "transB":
                    transB = at.i
        A = jnp.transpose(a) if transA else a
        B = jnp.transpose(b) if transB else b
        out = alpha * jnp.matmul(A, B)
        if c is not None:
            out = out + beta * c
        return out

    def Sum(self, *args, attribute=None):
        return self.Add(*args)

    def Concat(self, *args, attribute=None):
        axis = 0
        if attribute:
            for a in attribute:
                if a.name == "axis":
                    axis = a.i
        return jnp.concatenate([jnp.atleast_2d(v) for v in args], axis=axis)

    def Unsqueeze(self, x, axes=None, attribute=None):
        ax = None
        if attribute:
            for a in attribute:
                if a.name == "axes":
                    ax = list(a.ints)
        if ax is None and axes is not None:
            ax = np.asarray(axes).reshape(-1).tolist()
        out = x
        for a in sorted(ax or [0]):
            out = jnp.expand_dims(out, int(a))
        return out

    def Squeeze(self, x, axes=None, attribute=None):
        ax = None
        if attribute:
            for a in attribute:
                if a.name == "axes":
                    ax = tuple(a.ints)
        if ax is None and axes is not None:
            ax = tuple(np.asarray(axes).reshape(-1).tolist())
        return jnp.squeeze(x, axis=ax)

    def Slice(self, x, starts, ends, axes=None, steps=None, attribute=None):
        starts = np.asarray(starts).reshape(-1)
        ends = np.asarray(ends).reshape(-1)
        axes = (np.asarray(axes).reshape(-1) if axes is not None
                else np.arange(len(starts)))
        steps = (np.asarray(steps).reshape(-1) if steps is not None
                 else np.ones(len(starts), int))
        idx = [slice(None)] * x.ndim
        for s, e, a, st_ in zip(starts, ends, axes, steps):
            idx[int(a)] = slice(int(s), int(e), int(st_))
        return x[tuple(idx)]

    def Reshape(self, x, shape, attribute=None):
        return jnp.reshape(x, tuple(np.asarray(shape).reshape(-1)
                                    .astype(int)))

    def Shape(self, x, attribute=None):
        return np.array(x.shape)


class ONNXConversion:
    """Evaluate an ONNX model as traced JAX expressions (reference :10).

    Usage matches the reference: ``conv = ONNXConversion(model)``,
    ``conv.convert(input_name=value, ...)``, results via
    ``conv['layer_name']``.  Values may be numpy arrays or Sym expressions.
    """

    def __init__(self, model, model_name=None):
        if not _HAS_ONNX:
            raise ImportError("onnx is not installed")
        self.onnx_model = model
        graph = model.graph
        self.graph = graph
        self.initialized_tensors = {
            t.name: np.asarray(numpy_helper.to_array(t))
            for t in graph.initializer}
        self.inputs = [i for i in graph.input
                       if i.name not in self.initialized_tensors]
        self.input_names = [i.name for i in self.inputs]
        self.output_names = [o.name for o in graph.output]
        self.operations = ONNXOperations()
        self.values = {}

    def convert(self, **kwargs):
        """Walk the graph node-by-node (reference convert, :182-276)."""
        missing = set(self.input_names) - set(kwargs)
        assert not missing, f"missing graph inputs: {missing}"
        vals = dict(self.initialized_tensors)
        for name in self.input_names:
            v = kwargs[name]
            vals[name] = v if isinstance(v, Sym) else jnp.asarray(
                np.asarray(v, dtype=float))
        for node in self.graph.node:
            op = getattr(self.operations, node.op_type, None)
            assert op is not None, (
                f"ONNX op {node.op_type!r} is not supported.")
            args = [vals[i] for i in node.input]
            out = op(*args, attribute=node.attribute)
            vals[node.output[0]] = out
        self.values = vals
        return self

    def __getitem__(self, key):
        assert key in self.values, (
            f"no layer {key!r}; call convert() first. Known: "
            f"{list(self.values)[:20]}")
        return self.values[key]
