"""dompc_tpu — a TPU-native nonlinear MPC + MHE framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of do-mpc
(reference layout: do_mpc/__init__.py): symbolic CasADi graphs become traced
JAX functions, IPOPT becomes a custom batched interior-point solver with
stage-structured KKT factorization, SUNDIALS becomes fixed-step implicit
Radau collocation — everything jit/vmap/shard_map-able over TPU meshes.
"""
import os

# Accuracy-critical control workloads want f64 on CPU; on TPU the benches
# run f32 (see bench.py).  Opt in via DOMPC_TPU_X64=1 (tests do) — we avoid
# auto-detection here because querying the backend at import time would lock
# the platform choice for the whole process.
import jax as _jax
if os.environ.get("DOMPC_TPU_X64") == "1":
    _jax.config.update("jax_enable_x64", True)

# Platform override that works even when the environment pre-imports jax
# with a fixed platform before user code runs (JAX_PLATFORMS is read at
# import time and may be ignored; backends initialize lazily, so a config
# update here still takes effect).
_plat = os.environ.get("DOMPC_TPU_PLATFORM")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# TPU float32 matmuls default to bfloat16-grade precision, which floors the
# achievable KKT residual near 1e-3 — fatal for an optimizer (measured: the
# XLA QR band sweep's true residual is ~4e-4 at default precision vs ~3e-6
# at highest).  Control workloads are latency-, not flop-bound here, so full
# f32 contractions are the right framework default.  Override via env.
_jax.config.update(
    "jax_default_matmul_precision",
    os.environ.get("DOMPC_TPU_MATMUL_PRECISION", "highest"))

# Persistent compilation cache by default: an MPC setup compiles a large
# solver graph (tens of seconds through the TPU remote-compile tunnel) and
# the reference's analogue is a cached gcc-compiled NLP .so
# (do_mpc/optimizer.py:678-729, reused across runs at :718-719).  Users
# should not pay that on every process.  Opt out with
# DOMPC_TPU_CACHE_DIR="".
_cache_dir = os.environ.get("DOMPC_TPU_CACHE_DIR", "/tmp/jax_cache")
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from . import sym
from . import tools
from . import model
from . import data
from . import simulator as _simulator_mod
from .simulator import Simulator
from . import controller
from . import estimator
from . import optimizer
from . import sampling
from . import differentiator
from . import graphics
from . import parallel

# optional-dependency gates (reference: do_mpc/__init__.py:79-95)
try:
    import onnx as _onnx  # noqa: F401
    __ONNX_INSTALLED__ = True
    from . import sysid
except ImportError:
    __ONNX_INSTALLED__ = False

try:
    import asyncua as _asyncua  # noqa: F401
    __ASYNCUA_INSTALLED__ = True
except ImportError:
    __ASYNCUA_INSTALLED__ = False
# namespace/tag plumbing is importable without asyncua (RTClient/RTServer
# are None in that case)
from . import opcua

try:
    import flax as _flax  # noqa: F401
    __FLAX_INSTALLED__ = True
    from . import approximateMPC
except ImportError:
    __FLAX_INSTALLED__ = False

simulator = _simulator_mod

__version__ = "0.1.0"
