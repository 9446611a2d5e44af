"""Sampling-tools workflow (mirrors reference
examples/tools/sampling/regular/: sampling plan -> sampler -> data
handler).  Also demonstrates the TPU-native extra: `sample_batched`
evaluates all cases as one vmapped call instead of a Python loop."""
import sys
import os
import shutil

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "..", ".."))

import numpy as np
import dompc_tpu as dm


def main():
    data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "sample_results", "")
    shutil.rmtree(data_dir, ignore_errors=True)

    # 1. Plan: random cases over (alpha, beta)
    np.random.seed(123)
    sp = dm.sampling.SamplingPlanner()
    sp.set_param(overwrite=True)
    sp.data_dir = data_dir
    sp.set_sampling_var("alpha", np.random.randn)
    sp.set_sampling_var("beta", lambda: np.random.randint(0, 5))
    plan = sp.gen_sampling_plan(n_samples=10)
    sp.export("sampling_plan")

    # 2. Sample: evaluate a function per case, file-per-sample (resumable)
    sampler = dm.sampling.Sampler(plan)
    sampler.set_param(overwrite=True)
    sampler.data_dir = data_dir

    def sample_function(alpha, beta):
        return alpha * beta

    sampler.set_sample_function(sample_function)
    sampler.sample_data()

    # 3. Post-process with the DataHandler
    dh = dm.sampling.DataHandler(plan)
    dh.data_dir = data_dir
    dh.set_post_processing("res", lambda res: res)
    dh.set_post_processing("square", lambda res: res ** 2)
    for case in dh[:3]:
        print(f"id={case['id']}  alpha={case['alpha']:+.4f}  "
              f"beta={case['beta']}  res={case['res']:+.4f}")

    # filter by variable value
    big_beta = dh.filter(input_filter=lambda beta: beta > 2)
    print(f"{len(big_beta)} cases with beta > 2")

    # 4. TPU-native batched sampling: one vmapped evaluation for the
    #    whole plan (no per-case Python loop / files)
    import jax.numpy as jnp
    sampler2 = dm.sampling.Sampler(plan)
    sampler2.set_param(overwrite=True)
    sampler2.data_dir = data_dir

    def batched_function(alpha, beta):
        return jnp.asarray(alpha) * jnp.asarray(beta)

    results = sampler2.sample_batched(batched_function)
    print("batched results:", np.round(np.asarray(results), 4))

    return dh


if __name__ == "__main__":
    main()
