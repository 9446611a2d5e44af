"""ONNX-to-model conversion demo (mirrors reference
examples/tools/onnx_conversion/onnx_conversion_01.py, which converts a
keras net; neither keras nor the onnx package is installed in this
image, so the graph-walking path is gated and the op table — the part
the reference's tests exercise — is demonstrated directly)."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import numpy as np
from dompc_tpu.sysid._onnxconversion import ONNXOperations


def main():
    ops = ONNXOperations()

    # a 3 -> 5 -> 1 MLP evaluated through the ONNX op table, exactly what
    # the graph walker does node by node
    rng = np.random.default_rng(0)
    W1, b1 = rng.standard_normal((3, 5)), rng.standard_normal(5)
    W2, b2 = rng.standard_normal((5, 1)), rng.standard_normal(1)

    x = np.ones((1, 3))
    h = ops.Relu(ops.Add(ops.MatMul(x, W1), b1))
    y = ops.Add(ops.MatMul(h, W2), b2)
    print("MLP output via ONNX ops:", np.asarray(y).reshape(-1))

    try:
        import onnx  # noqa: F401
        from onnx import helper, TensorProto, numpy_helper
        from dompc_tpu.sysid import ONNXConversion

        # build the equivalent ONNX graph and walk it
        nodes = [
            helper.make_node("MatMul", ["input", "W1"], ["h0"]),
            helper.make_node("Add", ["h0", "b1"], ["h1"]),
            helper.make_node("Relu", ["h1"], ["hidden"]),
            helper.make_node("MatMul", ["hidden", "W2"], ["o0"]),
            helper.make_node("Add", ["o0", "b2"], ["output"]),
        ]
        graph = helper.make_graph(
            nodes, "mlp",
            [helper.make_tensor_value_info("input", TensorProto.FLOAT,
                                           [1, 3])],
            [helper.make_tensor_value_info("output", TensorProto.FLOAT,
                                           [1, 1])],
            initializer=[numpy_helper.from_array(a.astype(np.float32), n)
                         for a, n in ((W1, "W1"), (b1, "b1"),
                                      (W2, "W2"), (b2, "b2"))])
        converter = ONNXConversion(helper.make_model(graph))
        converter.convert(input=np.ones((1, 3)))
        print("graph walker output:", np.asarray(converter["output"]))
    except ImportError:
        print("onnx not installed: graph-walk step skipped "
              "(op-table path above is the tested surface)")

    return y


if __name__ == "__main__":
    main()
