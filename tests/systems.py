"""Shim: benchmark systems now live in the package (dompc_tpu.systems)."""
from dompc_tpu.systems import *  # noqa: F401,F403
