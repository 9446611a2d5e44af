"""Unit tests for the ONNX op table (reference: testing/test_onnx.py does
op-level checks of do_mpc/sysid/_onnxconversion.py:305-419).

The ``onnx`` package is not installed in this image, so the graph-walking
``ONNXConversion`` path is exercised only if onnx is importable; the op
semantics themselves (what the reference tests) need no onnx install.
"""
from types import SimpleNamespace

import numpy as np
import pytest

from dompc_tpu.sysid._onnxconversion import ONNXOperations


ops = ONNXOperations()


def _attr(**kw):
    out = []
    for name, val in kw.items():
        a = SimpleNamespace(name=name)
        if isinstance(val, float):
            a.f = val
        elif isinstance(val, int):
            a.i = val
        else:
            a.ints = list(val)
        out.append(a)
    return out


def test_activations():
    x = np.linspace(-3, 3, 13)
    np.testing.assert_allclose(np.asarray(ops.Tanh(x)), np.tanh(x),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.Sigmoid(x)),
                               1 / (1 + np.exp(-x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.Relu(x)), np.maximum(x, 0))
    elu = np.where(x > 0, x, 0.5 * (np.exp(x) - 1))
    np.testing.assert_allclose(np.asarray(ops.Elu(x, attribute=_attr(
        alpha=0.5))), elu, rtol=1e-6)


def test_gemm_attributes():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((5, 4))   # transB
    c = rng.standard_normal((3, 5))
    out = ops.Gemm(a, b, c, attribute=_attr(alpha=2.0, beta=0.5, transB=1))
    np.testing.assert_allclose(np.asarray(out), 2.0 * a @ b.T + 0.5 * c,
                               rtol=1e-5)


def test_matmul_add_sum_mul_sub():
    rng = np.random.default_rng(1)
    a, b = rng.standard_normal((2, 3)), rng.standard_normal((3, 2))
    np.testing.assert_allclose(np.asarray(ops.MatMul(a, b)), a @ b,
                               rtol=1e-6)
    x, y, z = rng.standard_normal((3, 4)), rng.standard_normal((3, 4)), \
        rng.standard_normal((3, 4))
    np.testing.assert_allclose(np.asarray(ops.Add(x, y, z)), x + y + z,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.Sum(x, y)), x + y, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.Mul(x, y)), x * y, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.Sub(x, y)), x - y, rtol=1e-6)


def test_shape_manipulation():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6))
    np.testing.assert_allclose(np.asarray(ops.Reshape(x, np.array([3, 4]))),
                               x.reshape(3, 4))
    np.testing.assert_array_equal(ops.Shape(x), np.array([2, 6]))
    np.testing.assert_allclose(
        np.asarray(ops.Concat(x, x, attribute=_attr(axis=1))),
        np.concatenate([x, x], axis=1))
    u = ops.Unsqueeze(x, attribute=_attr(axes=[0]))
    assert u.shape == (1, 2, 6)
    s = ops.Squeeze(np.asarray(u), attribute=_attr(axes=[0]))
    assert s.shape == (2, 6)
    sl = ops.Slice(x, starts=np.array([1]), ends=np.array([5]),
                   axes=np.array([1]), steps=np.array([2]))
    np.testing.assert_allclose(np.asarray(sl), x[:, 1:5:2])


def test_conversion_graph_walk():
    onnx = pytest.importorskip("onnx")
    from onnx import helper, TensorProto
    from dompc_tpu.sysid import ONNXConversion

    w = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    nodes = [
        helper.make_node("MatMul", ["x", "W"], ["h"]),
        helper.make_node("Tanh", ["h"], ["y"]),
    ]
    graph = helper.make_graph(
        nodes, "g",
        [helper.make_tensor_value_info("x", TensorProto.FLOAT, [1, 2])],
        [helper.make_tensor_value_info("y", TensorProto.FLOAT, [1, 2])],
        initializer=[onnx.numpy_helper.from_array(w, name="W")])
    model = helper.make_model(graph)
    conv = ONNXConversion(model)
    x = np.array([[0.1, -0.2]])
    conv.convert(x=x)
    np.testing.assert_allclose(np.asarray(conv["y"]), np.tanh(x @ w),
                               rtol=1e-5)
