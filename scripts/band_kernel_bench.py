"""Micro-benchmark: band-sweep backends on flagship-shaped data.

Isolated timings MISLEAD on this stack (BENCH.md r3 negative results);
this script exists for quick smoke/ordering checks only — the in-loop
bench.py A/B decides defaults.

Usage: python scripts/band_kernel_bench.py [N S b t reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    args = [int(a) for a in sys.argv[1:]]
    N, S, b, t, reps = (args + [1152, 21, 13, 12, 20][len(args):])[:5]

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    D = jnp.asarray(rng.standard_normal((N, S, b, b)), f32) \
        + 6 * jnp.eye(b, dtype=f32)
    U = jnp.asarray(rng.standard_normal((N, S - 1, b, b)), f32)
    Lo = jnp.asarray(rng.standard_normal((N, S - 1, b, b)), f32)
    rhs = jnp.asarray(rng.standard_normal((N, S, b, t)), f32)

    from dompc_tpu.solver.batchqr import band_solve_qr_lanes
    from dompc_tpu.solver.pallas_band import band_solve_qr_pallas_lanes

    backends = {
        "xla_lanes": jax.jit(band_solve_qr_lanes),
        "pallas_lanes": lambda D, U, Lo, r: band_solve_qr_pallas_lanes(
            D, U, Lo, r),
    }
    # vary the rhs every rep: identical (program, inputs) pairs can be
    # served from a result cache by the remote-execution tunnel, which
    # would report impossible sub-sweep times
    rhss = [jnp.asarray(rng.standard_normal((N, S, b, t)), f32)
            for _ in range(reps)]
    ref = None
    for name, fn in backends.items():
        try:
            t0 = time.perf_counter()
            out = fn(D, U, Lo, rhs)
            out.block_until_ready()
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for r in rhss:
                out = fn(D, U, Lo, r)
            out.block_until_ready()
            ms = 1e3 * (time.perf_counter() - t0) / reps
            if ref is None:
                ref = out
                rel = 0.0
            else:
                rel = float(jnp.max(jnp.abs(out - ref))
                            / jnp.max(jnp.abs(ref)))
            print(f"{name}: {ms:.3f} ms/solve (compile {compile_s:.1f}s, "
                  f"rel vs first {rel:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
