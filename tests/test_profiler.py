"""jax.profiler hooks (SURVEY §5: wrap solves with jax.profiler hooks).
The annotations are no-ops without an active trace (safe in the hot
path); with a trace active, a TensorBoard/xprof-loadable capture lands
in the logdir."""
import glob
import os

import numpy as np

import dompc_tpu as dm
from dompc_tpu.tools import profiler


def test_annotations_are_noops_without_trace():
    with profiler.annotate("unit-region"):
        with profiler.step_annotation("unit-step", 3):
            pass


def test_trace_capture(tmp_path):
    import jax.numpy as jnp
    logdir = str(tmp_path / "trace")
    with profiler.trace(logdir):
        with profiler.annotate("dompc_tpu.unit.matmul"):
            jnp.dot(jnp.ones((16, 16)),
                    jnp.ones((16, 16))).block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*.*"), recursive=True)
    assert files, "profiler trace produced no capture files"


def test_solve_is_annotated(tmp_path):
    """MPC.solve runs under a StepTraceAnnotation and still solves."""
    model = dm.model.Model("continuous")
    x = model.set_variable("_x", "x")
    u = model.set_variable("_u", "u")
    model.set_rhs("x", -x + u)
    model.setup()
    mpc = dm.controller.MPC(model)
    mpc.settings.n_horizon = 3
    mpc.settings.t_step = 0.5
    mpc.set_objective(mterm=x ** 2, lterm=x ** 2)
    mpc.set_rterm(u=0.01)
    mpc.setup()
    mpc.x0 = np.array([1.0])
    mpc.set_initial_guess()
    with profiler.trace(str(tmp_path / "trace")):
        u0 = mpc.make_step(np.array([1.0]))
    assert np.all(np.isfinite(u0))
    assert mpc._n_solves == 1
