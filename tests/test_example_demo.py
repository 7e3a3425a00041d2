"""Smoke for the standalone phoneme-predictor demo."""

import subprocess
import sys

from .conftest import REPO_ROOT


def test_phoneme_predictor_demo_runs():
    out = subprocess.run(
        [sys.executable, "examples/phoneme_predictor.py",
         "--sentence", "xin chào 123", "--model-dim", "48"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/.axon_site"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Token 1:" in out.stdout
