"""Multi-chip scale-out (SURVEY.md §2.3).

The reference's only parallelism is process-level sampling with
``multiprocessing.Pool`` + file-based work stealing
(do_mpc/sampling/_sampler.py:218-242); here the axes are:

* ``vmap`` — thousands of NMPC/MHE solves per chip (batched KKT sweeps hit
  the MXU as (B, S, b, b) tensors),
* ``shard_map`` over a 1-D ``batch`` mesh axis — scale across chips/hosts
  with deterministic shard assignment; metrics reduced with ``psum`` over
  ICI.

There is no tensor/pipeline-parallel analogue in this problem class (the
reference has none either); the scenario tree is kept on-chip because its
KKT coupling is stage-local.
"""
from .batch import (make_batch_solver, make_sharded_solver, batch_mesh,
                    initial_guess_from_x0, make_shift_fn, init_distributed)

__all__ = ["make_batch_solver", "make_sharded_solver", "batch_mesh",
           "initial_guess_from_x0", "make_shift_fn", "init_distributed"]
