"""jax.profiler integration — tracing/profiling hooks for solves.

SURVEY §5 prescribes wrapping solves with ``jax.profiler`` hooks while
keeping the reference's stats-dict-per-step design (reference solver
stats: do_mpc/optimizer.py:789-800 exposes IPOPT's per-solve stats; the
reference has no device tracer).  On TPU the XLA profiler is the
observability tool: the framework annotates its hot calls (MPC/MHE
solves, simulator steps) with TraceMe events that appear on the profiler
timeline, and exposes programmatic trace capture.

Usage::

    with dm.tools.profiler.trace("/tmp/jax-trace"):
        mpc.make_step(x0)        # annotated as dompc_tpu.MPC.solve/<n>
    # -> load /tmp/jax-trace in TensorBoard or xprof

Annotations are TraceMe no-ops unless a trace is active, so they stay in
the hot path permanently.
"""
import contextlib

import jax


def start_trace(logdir, create_perfetto_link=False,
                create_perfetto_trace=False):
    """Begin a profiler trace (TensorBoard/xprof-loadable)."""
    jax.profiler.start_trace(
        logdir, create_perfetto_link=create_perfetto_link,
        create_perfetto_trace=create_perfetto_trace)


def stop_trace():
    """End the trace started by :func:`start_trace`."""
    jax.profiler.stop_trace()


@contextlib.contextmanager
def trace(logdir, **kwargs):
    """Context manager capturing a profiler trace of the enclosed block."""
    start_trace(logdir, **kwargs)
    try:
        yield
    finally:
        stop_trace()


def annotate(name, **kwargs):
    """Named TraceMe annotation for a code region (shows on the profiler
    timeline when a trace is active; near-zero cost otherwise)."""
    return jax.profiler.TraceAnnotation(name, **kwargs)


def step_annotation(name, step_num):
    """Step-structured annotation (groups device ops under step markers,
    the idiom for iterative solve/training loops)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step_num)


def save_device_memory_profile(path):
    """Dump a pprof-format device memory profile (HBM attribution)."""
    jax.profiler.save_device_memory_profile(path)
