"""Elastic recovery under a REAL preemption: SIGKILL the training process
mid-run, relaunch the identical command, and require it to auto-resume from
last_ckp and finish.

The in-process resume tests (`test_executor_latr.py`) prove value-level
state restoration; this one proves the whole contract end to end the way a
preempted TPU worker experiences it — a fresh process, the same
`run.py --mode train` invocation, no flags (reference auto-resume contract:
`/root/reference/core/executor/base_executor.py:174-184`).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_mid_train_then_resume_completes(tmp_path):
    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(
        paths, save_path, NUM_EPOCHS=3, SAVE=True, SAVE_EVERY_STEPS=1,
        TRAIN_BATCH_SIZE=4,
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    cmd = [sys.executable, os.path.join(REPO, "run.py"),
           "--config-file", yaml_path, "--mode", "train"]

    # --- first launch: kill -9 once the first checkpoint lands -------------
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    last_dir = os.path.join(save_path, "last_ckp")
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise AssertionError(f"train exited before kill:\n{out[-2000:]}")
            if os.path.isdir(last_dir) and os.listdir(last_dir):
                time.sleep(1.0)  # let an in-flight async save settle
                break
            time.sleep(0.5)
        else:
            raise AssertionError("no checkpoint appeared within 300s")
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.kill()
        proc.wait()

    # --- second launch: must resume and run to completion ------------------
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    log = r.stdout + r.stderr
    assert "###Resumed from last_ckp" in log, log[-3000:]
    assert "TRAINING END" in log, log[-3000:]

    # eval from the final checkpoint works
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "--config-file", yaml_path, "--mode", "eval", "--evaltype", "last"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-2000:])
