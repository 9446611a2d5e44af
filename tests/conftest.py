"""Test environment: CPU backend with 8 virtual devices + f64.

The image's sitecustomize pre-imports jax with the tunneled TPU (axon)
platform, so env vars are too late — but backends initialize lazily, so
jax.config.update still works here.  Multi-chip sharding tests use the 8
virtual CPU devices (see SURVEY.md §4); benches (bench.py) keep the TPU.
"""
import os

import jax

if os.environ.get("DOMPC_TEST_TPU"):
    # opt-in hardware mode: keep whatever accelerator jax resolved so the
    # @pytest.mark.tpu tests exercise compiled (Mosaic) kernels; f32 only
    # (this chip has no f64)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
else:
    os.environ["DOMPC_TPU_X64"] = "1"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: the fast suite's wall time is dominated
# by compiles of programs that rarely change between runs (the solver
# trace over each model family); repeat runs on the same host reuse them
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DOMPC_TEST_CACHE", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
