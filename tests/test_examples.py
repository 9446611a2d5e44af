"""Smoke tests for the user-facing example suite (reference convention:
examples/<name>/template_{model,mpc,simulator,mhe}.py + main.py, e.g.
/root/reference/examples/CSTR/template_mpc.py:44).  Each main must run a
short closed loop on CPU; step counts are trimmed via env knobs."""
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(rel, env_extra=None, timeout=1500):
    env = dict(os.environ)
    env["DOMPC_TPU_X64"] = "1"
    # JAX_PLATFORMS is ignored when the image pre-imports jax; the library
    # honors DOMPC_TPU_PLATFORM instead (dompc_tpu/__init__.py)
    env["DOMPC_TPU_PLATFORM"] = "cpu"
    env["DOMPC_STEPS"] = "2"
    env.update(env_extra or {})
    path = os.path.join(EXAMPLES, rel)
    res = subprocess.run(
        [sys.executable, os.path.basename(path)],
        cwd=os.path.dirname(path), env=env, timeout=timeout,
        capture_output=True, text=True)
    assert res.returncode == 0, (
        f"{rel} failed:\n{res.stdout[-2000:]}\n{res.stderr[-3000:]}")
    return res.stdout


def test_example_oscillating_masses_discrete():
    out = _run("oscillating_masses_discrete/main.py")
    assert "k= 9" in out


def test_example_lqr():
    out = _run("lqr_examples/oscillating_masses_lqr.py")
    assert "u=" in out


@pytest.mark.slow
def test_example_cstr():
    out = _run("CSTR/main.py")
    assert "C_b=" in out


@pytest.mark.slow
def test_example_batch_reactor():
    out = _run("batch_reactor/main.py")
    assert "P_s=" in out


@pytest.mark.slow
def test_example_rotating_masses_mhe_mpc():
    out = _run("rotating_oscillating_masses_mhe_mpc/main.py")
    assert "Theta_1_est=" in out


@pytest.mark.slow
def test_example_dip():
    out = _run("double_inverted_pendulum/main.py",
               env_extra={"DOMPC_DIP_N": "20"})
    assert "force=" in out


@pytest.mark.slow
def test_example_cstr_approximate_mpc(tmp_path):
    out = _run("CSTR_approximate_mpc/main.py",
               env_extra={"DOMPC_AMPC_SAMPLES": "32"})
    assert "train loss" in out


@pytest.mark.slow
def test_example_batch_reactor_differentiator():
    out = _run("batch_reactor_differentiator/main.py")
    assert "du0/dx0" in out


def test_example_kinematic_bicycle():
    out = _run("kinematic_bicycle_model/main.py")
    assert "Delta=" in out


@pytest.mark.slow
def test_example_dynamic_bicycle():
    out = _run("dynamic_bicycle_model/main.py")
    assert "Y_p=" in out


@pytest.mark.slow
def test_example_lotka_volterra():
    out = _run("Lotka_Volterra/main.py")
    assert "prey=" in out


@pytest.mark.slow
def test_example_industrial_poly():
    out = _run("industrial_poly/main.py")
    assert "m_P=" in out


@pytest.mark.slow
def test_example_kite():
    out = _run("kite/main.py", env_extra={"DOMPC_KITE_N": "20"})
    assert "height=" in out


def test_example_oscillating_masses_discrete_dae():
    out = _run("oscillating_masses_discrete_dae/main.py")
    assert "cost=" in out


@pytest.mark.slow
def test_example_triple_tank_ekf():
    out = _run("triple_tank_ekf/main.py", env_extra={"DOMPC_STEPS": "30"})
    assert "estimate err" in out


def test_example_tools_sampling():
    out = _run("tools/sampling/main.py")
    assert "batched results" in out


@pytest.mark.slow
def test_example_tools_nlpdifferentiator():
    out = _run("tools/nlpdifferentiator/demo_nlp_differentiator.py")
    assert "ACTIVE" in out and "FD   du3*/dx0" in out


def test_example_tools_onnx():
    out = _run("tools/onnx_conversion/onnx_conversion_01.py")
    assert "MLP output via ONNX ops" in out


@pytest.mark.slow
def test_example_tools_pytorch(tmp_path):
    out = _run("tools/pytorch_2_dompc/main.py",
               env_extra={"DOMPC_EPOCHS": "150", "DOMPC_STEPS": "3"})
    assert "surrogate-driven MPC" in out
