"""Import/CLI smoke tests for the example scripts (notebook equivalents)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
SCRIPTS = [
    "examples/celeb_sampler.py",
    "examples/likelihood_eval.py",
    "examples/sd_inference.py",
    "examples/inference_time_mitigation.py",
    "examples/sscd_score.py",
    "examples/membership_curve.py",
    "examples/webster_prompts.py",
    "scripts/make_tshirt_dataset.py",
    "scripts/convert_hf_checkpoint.py",
    "scripts/build_native.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), "--help"],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "usage" in proc.stdout.lower()
