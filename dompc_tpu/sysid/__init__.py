"""System identification tools (reference: do_mpc/sysid/)."""
from ._onnxconversion import ONNXConversion, ONNXOperations

__all__ = ["ONNXConversion", "ONNXOperations"]
