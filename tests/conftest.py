"""Test environment: CPU backend with 8 virtual devices + f64.

The image's sitecustomize pre-imports jax with the tunneled TPU (axon)
platform, so env vars are too late — but backends initialize lazily, so
jax.config.update still works here.  Multi-chip sharding tests use the 8
virtual CPU devices (see SURVEY.md §4); benches (bench.py) keep the TPU.
"""
import os

os.environ["DOMPC_TPU_X64"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
