"""Two-process jax.distributed smoke test of the multi-host path.

The reference scales sampling studies across processes with file locking +
mp.Pool (do_mpc/sampling/_sampler.py:218); the TPU-native equivalent is
one JAX process per host joined into a global device mesh over DCN
(`parallel.init_distributed` + `make_sharded_solver`).  Real multi-host
hardware is unavailable here, so this test runs the genuine
`jax.distributed` wire protocol between two local CPU processes (2 local
devices each -> a 4-device global mesh) and asserts the psum'd success
count — the first end-to-end evidence the DCN init path works (SURVEY
§2.3 comm-backend row).
"""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid = int(sys.argv[1])
port = sys.argv[2]

sys.path.insert(0, os.environ["DOMPC_REPO"])
os.environ.setdefault("COORDINATOR_ADDRESS", f"127.0.0.1:{port}")
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(pid)
from dompc_tpu.parallel import init_distributed
assert init_distributed(), "init_distributed returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from dompc_tpu.systems import oscillating_masses_model, oscillating_masses_mpc
from dompc_tpu.parallel import (make_sharded_solver, batch_mesh,
                                initial_guess_from_x0)

model = oscillating_masses_model()
mpc = oscillating_masses_mpc(model)
mesh = batch_mesh()        # all 4 global devices
solver, mesh = make_sharded_solver(mpc, mesh=mesh, tol=1e-6,
                                   throughput_mode=True)

B = 8   # global batch; 2 per device
rng = np.random.default_rng(0)
x0s_full = 0.4 * rng.standard_normal((B, model.n_x))
w0s_full = initial_guess_from_x0(mpc, x0s_full)
sharding = NamedSharding(mesh, P("batch"))

def to_global(arr):
    arr = jnp.asarray(arr, jnp.float64)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.asarray(arr[idx]))

u0, iters, n_ok = solver(to_global(x0s_full), to_global(w0s_full))
n_ok = float(n_ok)   # psum over the global mesh, replicated everywhere
assert n_ok == B, f"process {pid}: global success count {n_ok} != {B}"
print(f"MULTIHOST_OK pid={pid} n_ok={n_ok}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = "57431"
    env = dict(os.environ)
    env["DOMPC_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["DOMPC_TPU_X64"] = "1"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}")
        assert f"MULTIHOST_OK pid={pid}" in out, out[-4000:]
