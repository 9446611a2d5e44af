"""Plan execution (reference: do_mpc/sampling/_sampler.py:13-242).

Keeps the reference's resumable file-per-sample workflow (existing files are
skipped, ref :218) and adds :meth:`sample_batched` which evaluates a
jax-vmappable sample function for the whole plan in one batched call — the
TPU-native replacement for the reference's multiprocessing examples."""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..tools import printProgressBar


class Sampler:
    def __init__(self, sampling_plan, **kwargs):
        assert isinstance(sampling_plan, list)
        self.sampling_plan = sampling_plan
        self.sampling_vars = [k for k in sampling_plan[0].keys()
                              if k != "id"]
        self.n_samples = len(sampling_plan)
        self.data_dir = "./"
        self.sample_name = "sample"
        self.save_format = "pickle"
        self.overwrite = False
        self.print_progress = True
        self.sample_function = None
        self.set_param(**kwargs)

    @property
    def data_dir(self):
        return self._data_dir

    @data_dir.setter
    def data_dir(self, val):
        self._data_dir = val

    def set_param(self, **kwargs):
        for k, v in kwargs.items():
            if not hasattr(self, k):
                print(f"Warning: {k} is not a valid Sampler param.")
            else:
                setattr(self, k, v)

    def set_sample_function(self, sample_function):
        """``sample_function(**case_vars) -> result`` (reference :133)."""
        self.sample_function = sample_function

    def _save_name(self, sample_id):
        name = f"{self.sample_name}_{sample_id}"
        ext = ".pkl" if self.save_format == "pickle" else ".mat"
        return os.path.join(self.data_dir, name + ext)

    def _save(self, save_name, result):
        os.makedirs(self.data_dir, exist_ok=True)
        if self.save_format == "pickle":
            with open(save_name, "wb") as f:
                pickle.dump(result, f)
        elif self.save_format == "mat":
            from scipy.io import savemat
            savemat(save_name, {"res": result})

    def sample_idx(self, idx: int):
        """Run one plan entry; skip if its file exists (reference :198-228)."""
        assert self.sample_function is not None, "set_sample_function first"
        case = self.sampling_plan[idx]
        save_name = self._save_name(case["id"])
        if os.path.isfile(save_name) and not self.overwrite:
            return
        inputs = {k: v for k, v in case.items() if k != "id"}
        result = self.sample_function(**inputs)
        self._save(save_name, result)
        if self.print_progress:
            printProgressBar(idx + 1, self.n_samples, prefix="Progress:",
                             length=50)

    def sample_data(self):
        """Run the full plan sequentially (reference :230-242)."""
        for i in range(self.n_samples):
            self.sample_idx(i)

    def sample_batched(self, batched_function=None):
        """Evaluate the whole plan in one batched (vmapped) call.

        ``batched_function(**stacked_vars) -> pytree with leading batch
        axis``; defaults to ``jax.vmap`` of the scalar sample_function.
        Results are written to the same per-sample files, so DataHandler
        and resumability work unchanged.
        """
        import jax
        import jax.numpy as jnp

        fn = batched_function
        if fn is None:
            assert self.sample_function is not None
            fn = jax.vmap(lambda kw: self.sample_function(**kw))
            stacked = {k: jnp.asarray(np.stack(
                [np.asarray(c[k]) for c in self.sampling_plan]))
                for k in self.sampling_vars}
            results = fn(stacked)
        else:
            stacked = {k: jnp.asarray(np.stack(
                [np.asarray(c[k]) for c in self.sampling_plan]))
                for k in self.sampling_vars}
            results = fn(**stacked)
        results = jax.tree.map(np.asarray, results)
        for i, case in enumerate(self.sampling_plan):
            res_i = jax.tree.map(lambda a: a[i], results)
            self._save(self._save_name(case["id"]), res_i)
        return results
