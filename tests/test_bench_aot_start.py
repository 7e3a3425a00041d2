"""Guard for the cold-start harness (`scripts/bench_aot_start.py`): its
--tiny self-test drives the REAL `serve.py --prime` CLI through all four
restart regimes (cold / cold+pack / cache-primed / aot) in subprocesses and
asserts the aot regime actually loaded the packed store. Keeping this green
means the TPU run of the same script only changes dims and device."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_aot_start_tiny(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_aot_start.py"),
         "--tiny", "--batch", "4", "--work", str(tmp_path / "work"),
         "--out", str(tmp_path / "table.md")],
        cwd=REPO, env=dict(os.environ), capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-2000:])
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    regimes = [run["regime"] for run in summary["runs"]]
    assert regimes == ["cold", "cold+pack", "cache", "aot"]
    assert summary["runs"][-1]["aot_loaded"] is True
    assert all(run["ready_s"] is not None for run in summary["runs"])
    table = open(tmp_path / "table.md", encoding="utf-8").read()
    assert "| aot |" in table
