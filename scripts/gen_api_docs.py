"""Generate the markdown API reference (docs/api/) from docstrings.

The reference ships a Sphinx site with a full API reference
(do-mpc documentation/source/*.rst); here the same surface is rendered
as markdown straight from the package's docstrings — run after API
changes: ``python scripts/gen_api_docs.py``.
"""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MODULES = [
    ("dompc_tpu", "Package root: configuration policy and submodules"),
    ("dompc_tpu.model._model", "Model definition"),
    ("dompc_tpu.model._linearmodel", "Linear models"),
    ("dompc_tpu.model._linearize", "Linearization"),
    ("dompc_tpu.model._dae2ode", "DAE-to-ODE conversion"),
    ("dompc_tpu.controller._mpc", "Model predictive control"),
    ("dompc_tpu.controller._lqr", "Linear-quadratic regulator"),
    ("dompc_tpu.controller._controllersettings", "Controller settings"),
    ("dompc_tpu.estimator._mhe", "Moving-horizon estimation"),
    ("dompc_tpu.estimator._ekf", "Extended Kalman filter"),
    ("dompc_tpu.estimator._base", "Estimator base classes"),
    ("dompc_tpu.simulator", "Plant simulation"),
    ("dompc_tpu.optimizer", "Transcription and optimizer base"),
    ("dompc_tpu.data", "Result data containers"),
    ("dompc_tpu.graphics", "Plotting and animation"),
    ("dompc_tpu.sampling._samplingplanner", "Sampling plans"),
    ("dompc_tpu.sampling._sampler", "Samplers"),
    ("dompc_tpu.sampling._datahandler", "Sampling data handling"),
    ("dompc_tpu.differentiator._nlpdifferentiator", "NLP sensitivities"),
    ("dompc_tpu.approximateMPC._ampc", "Approximate MPC policies"),
    ("dompc_tpu.approximateMPC._ampc_sampler", "Approx-MPC data"),
    ("dompc_tpu.approximateMPC._trainer", "Policy training"),
    ("dompc_tpu.sysid._onnxconversion", "ONNX model import"),
    ("dompc_tpu.opcua", "Real-time OPC UA"),
    ("dompc_tpu.solver.ipm", "Interior-point NLP solver"),
    ("dompc_tpu.solver.bbd", "Bordered-block-diagonal KKT"),
    ("dompc_tpu.solver.batchqr", "Batch-in-lanes QR sweeps"),
    ("dompc_tpu.solver.pallas_band", "Pallas band kernels"),
    ("dompc_tpu.solver.structured", "Structured band assembly"),
    ("dompc_tpu.solver.minlp", "Branch-and-bound MINLP"),
    ("dompc_tpu.ops.integrators", "ODE/DAE integrators"),
    ("dompc_tpu.ops.collocation", "Collocation matrices"),
    ("dompc_tpu.parallel.batch", "Batched and sharded solves"),
    ("dompc_tpu.sym", "Symbolic expression layer"),
    ("dompc_tpu.tools._structure", "Structures and accessors"),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return "\n".join(indent + ln for ln in d.splitlines())


def render(modname, title):
    import importlib
    mod = importlib.import_module(modname)
    out = [f"# `{modname}` — {title}\n"]
    if mod.__doc__:
        out.append(inspect.cleandoc(mod.__doc__) + "\n")
    classes = []
    funcs = []
    for name in sorted(dir(mod)):
        if name.startswith("_"):
            continue
        obj = getattr(mod, name)
        if inspect.isclass(obj) and obj.__module__ == modname:
            classes.append((name, obj))
        elif inspect.isfunction(obj) and obj.__module__ == modname:
            funcs.append((name, obj))
    for name, cls in classes:
        out.append(f"## class `{name}{_sig(cls)}`\n")
        if inspect.getdoc(cls):
            out.append(_doc(cls) + "\n")
        for mname in sorted(dir(cls)):
            if mname.startswith("_"):
                continue
            m = cls.__dict__.get(mname)
            if isinstance(m, property):
                out.append(f"- **property `{mname}`** — "
                           f"{(inspect.getdoc(m) or '').splitlines()[0] if inspect.getdoc(m) else ''}")
            elif inspect.isfunction(m):
                out.append(f"### `{name}.{mname}{_sig(m)}`\n")
                if inspect.getdoc(m):
                    out.append(_doc(m) + "\n")
        out.append("")
    for name, fn in funcs:
        out.append(f"## `{name}{_sig(fn)}`\n")
        if inspect.getdoc(fn):
            out.append(_doc(fn) + "\n")
    return "\n".join(out) + "\n"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api")
    os.makedirs(root, exist_ok=True)
    index = ["# API reference\n",
             "Generated from docstrings by `scripts/gen_api_docs.py`.\n"]
    for modname, title in MODULES:
        fname = modname.replace(".", "_") + ".md"
        try:
            text = render(modname, title)
        except Exception as e:  # noqa: BLE001
            print(f"skip {modname}: {e}")
            continue
        with open(os.path.join(root, fname), "w") as fh:
            fh.write(text)
        index.append(f"- [`{modname}`]({fname}) — {title}")
        print(f"wrote {fname} ({len(text.splitlines())} lines)")
    with open(os.path.join(root, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
