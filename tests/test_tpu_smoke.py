"""Guard for the production-arc harness (`scripts/tpu_smoke.py`): its --tiny
self-test drives the REAL `run.py` CLI through train -> eval-from-best ->
predict in subprocesses against a synthetic fixture and verifies the
produced artifacts (orbax trees, metrics.jsonl, results.json). Keeping this
green means the TPU run of the same script only changes dims and device."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_smoke_tiny_arc(tmp_path):
    out_md = str(tmp_path / "TPU_RUN.md")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py"),
         "--tiny", "--rows", "32", "--epochs", "1",
         "--work", str(tmp_path / "work"), "--out", out_md],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-2000:])
    report = open(out_md, encoding="utf-8").read()
    assert "| train |" in report and "results.json" in report
