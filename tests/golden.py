"""Extract golden IPOPT/CVODES trajectories from the reference repo's result
pickles (/root/reference/testing/results/*.pkl) without importing do_mpc or
casadi: a stubbing Unpickler reconstructs only the plain numpy payload that
do-mpc's Data.__getstate__ keeps (reference: do_mpc/data.py:50-58)."""
import os
import pickle

GOLDEN_DIR = os.environ.get("DOMPC_GOLDEN_DIR",
                            "/root/reference/testing/results")


class _Stub:
    def __init__(self, *a, **k):
        pass


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("do_mpc") or module.startswith("casadi"):
            return type(name, (_Stub,), {"__module__": module})
        return super().find_class(module, name)


def load_golden(name):
    """Return {'mpc': obj, 'simulator': obj, ...}; each obj has numpy attrs
    _x, _u, _z, _time, ..."""
    path = f"{GOLDEN_DIR}/{name}"
    if not path.endswith(".pkl"):
        path += ".pkl"
    if not os.path.exists(path):
        # CI runners don't carry the reference checkout; golden-comparison
        # tests skip rather than fail (set DOMPC_GOLDEN_DIR to point at a
        # copy of the reference's testing/results directory).
        import pytest
        pytest.skip(f"golden data not available: {path} "
                    "(set DOMPC_GOLDEN_DIR)")
    with open(path, "rb") as f:
        return _StubUnpickler(f).load()
