"""Weak-scaling measurement on a virtual CPU device mesh.

Runs the flagship sharded batched-NMPC solve (robust CSTR N=20, condensed
structured KKT, throughput mode) at a fixed PER-DEVICE batch over meshes
of different sizes and reports solves/s; weak-scaling efficiency is
rate(n2)/rate(n1) * (n1/n2).  Multi-chip TPU hardware is not available in
this environment (BENCH.md), so the mesh is n virtual CPU devices — the
sharding/collective program is identical, only the backend differs.

Usage:
  python scripts/scaling_bench.py            # driver: runs 4- and 8-device
  python scripts/scaling_bench.py <n_dev>    # one measurement (JSON line)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(n_devices, per_device_batch=4, reps=3):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(n_devices))
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _build_cstr_mpc
    from dompc_tpu.parallel import (make_sharded_solver, batch_mesh,
                                    initial_guess_from_x0)

    mesh = batch_mesh(n_devices)
    mpc = _build_cstr_mpc(n_horizon=20, n_robust=1, kkt_solver="auto")
    x0 = np.array([0.8, 0.5, 134.14, 130.0])
    mpc.x0 = x0
    mpc.set_initial_guess()
    B = per_device_batch * n_devices
    rng = np.random.default_rng(0)
    x0s = x0[None, :] * (1.0 + 0.01 * rng.standard_normal((B, 4)))
    W = jnp.asarray(initial_guess_from_x0(mpc, x0s))
    X = jnp.asarray(x0s)
    sharded, _ = make_sharded_solver(mpc, mesh=mesh, tol=1e-3, max_iter=40,
                                     throughput_mode=True)
    u0s, iters, n_ok = sharded(X, W)
    u0s.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        u0s, iters, n_ok = sharded(X, W)
        u0s.block_until_ready()
    wall = time.perf_counter() - t0

    # collective cost: the solver's only cross-device communication is
    # the scalar success psum; time it standalone on the same mesh
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ax = mesh.axis_names[0]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(ax), out_specs=P())
    def psum_only(v):
        return jax.lax.psum(jnp.sum(v), ax)

    v = jnp.ones((B,))
    psum_only(v).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(100):
        out = psum_only(v)
    out.block_until_ready()
    psum_ms = (time.perf_counter() - t0) / 100 * 1e3
    return {"n_devices": n_devices, "batch": B,
            "solves_per_s": round(B * reps / wall, 3),
            "psum_overhead_ms": round(psum_ms, 4),
            "success": float(n_ok) / B}


def main():
    if len(sys.argv) > 1:
        print(json.dumps(measure(int(sys.argv[1]))))
        return
    # A virtual n-device CPU mesh shares the host's physical cores, so the
    # meaningful weak-scaling pair is the largest (n1, 2*n1) that still
    # fits in real cores; beyond that, total throughput is core-bound and
    # efficiency trends to 0.5 by construction (measured: 0.451 at 4->8 on
    # a 2-core host).  On real multi-chip hardware each mesh device owns
    # its own compute and the same program scales per-chip.
    cores = os.cpu_count() or 1
    sizes = (1, 2, 4, 8)
    results = []
    for n in sizes:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n)],
            capture_output=True, text=True, timeout=3000,
            env=dict(os.environ, DOMPC_TPU_X64="0"))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)
    r1 = results[0]
    table = []
    for r in results:
        eff = (r["solves_per_s"] / r1["solves_per_s"]) / r["n_devices"]
        table.append({**r, "efficiency_vs_1dev": round(eff, 3)})
    # the honest pair on this host: the largest mesh whose devices map
    # to distinct physical cores; beyond that, virtual devices share
    # cores and total throughput is core-bound (efficiency trends to
    # cores/n by construction) — on real multi-chip hardware each mesh
    # device owns its own compute and the same program scales per-chip
    honest_n = max(1, cores)
    summary = {
        "metric": "weak_scaling_virtual_mesh",
        "host_cores": cores,
        "honest_pair_max_devices": honest_n,
        "table": table,
        "note": ("virtual CPU devices share the host's physical cores; "
                 "efficiency beyond n=cores measures core contention, "
                 "not the sharded program (whose only collective is one "
                 "scalar psum — see psum_overhead_ms)")}
    print(json.dumps(summary))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTICHIP_DRYRUN.json")
    try:
        with open(out_path) as f:
            existing = json.load(f)
    except Exception:
        existing = {}
    existing["weak_scaling"] = summary
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
