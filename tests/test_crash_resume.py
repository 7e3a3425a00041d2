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

import jax
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


class _Die(Exception):
    pass


def _capture_losses(ex, sink, die_after=None):
    """Record per-step losses; optionally raise BEFORE computing step
    die_after+1 (so the last saved checkpoint reflects step die_after)."""
    inner = ex.train_step

    def wrapped(state, batch):
        if die_after is not None and len(sink) >= die_after:
            raise _Die
        state, loss = inner(state, batch)
        sink.append(float(loss))
        return state, loss

    ex.train_step = wrapped


def test_step_level_resume_matches_uninterrupted_trajectory(tmp_path):
    """SAVE_EVERY_STEPS + step-level resume: a run killed mid-epoch and
    resumed must produce EXACTLY the per-step losses of the uninterrupted
    run from that point — the interrupted epoch continues at the next batch
    (epoch-seeded shuffle fast-forward), it does not restart. The reference
    replays up to a full epoch (base_executor.py:174-184)."""
    import numpy as np

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    common = dict(NUM_EPOCHS=2, SAVE=True, SAVE_EVERY_STEPS=1,
                  TRAIN_BATCH_SIZE=2)

    # --- run A: uninterrupted, 2 epochs x 6 steps -------------------------
    ya = tiny_latr_yaml(paths, str(tmp_path / "ckA"), **common)
    exa = EXECUTORS.get(get_config(ya).EXECUTOR)(get_config(ya), mode="train")
    losses_a: list = []
    _capture_losses(exa, losses_a)
    exa.run()
    assert len(losses_a) == 12

    # --- run B: die mid-epoch-1 (after step 4 of 6), then resume ----------
    yb = tiny_latr_yaml(paths, str(tmp_path / "ckB"), **common)
    exb = EXECUTORS.get(get_config(yb).EXECUTOR)(get_config(yb), mode="train")
    losses_b: list = []
    _capture_losses(exb, losses_b, die_after=4)
    with pytest.raises(_Die):
        exb.run()
    exb.ckpt.wait()
    assert len(losses_b) == 4

    exb2 = EXECUTORS.get(get_config(yb).EXECUTOR)(get_config(yb), mode="train")
    assert int(exb2.state.step) == 4
    assert exb2._resume_step_in_epoch == 4  # mid-epoch tag restored
    _capture_losses(exb2, losses_b)
    exb2.run()
    assert len(losses_b) == 12

    np.testing.assert_allclose(losses_b, losses_a, rtol=0, atol=0)
    """Switching OPTIMIZER (adam -> adafactor) on an existing run must not
    silently restart from scratch: the full-checkpoint restore fails on the
    opt_state template, but the trained params AND step are salvaged with a
    fresh optimizer (ADVICE r2 items 2-3 — step matters because the
    epoch-decay LR schedule keys on it)."""
    import numpy as np

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1)
    config = get_config(yaml_path)
    ex0 = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex0.run()
    trained = jax.tree.map(
        lambda x: __import__("numpy").asarray(x), ex0.state.params
    )
    step0, epoch0 = int(ex0.state.step), int(ex0.state.epoch)
    assert step0 > 0

    yaml2 = tiny_latr_yaml(paths, save, NUM_EPOCHS=1, OPTIMIZER="adafactor")
    ex1 = EXECUTORS.get(get_config(yaml2).EXECUTOR)(
        get_config(yaml2), mode="train"
    )
    assert int(ex1.state.step) == step0, "step lost in params-only resume"
    assert int(ex1.state.epoch) == epoch0
    for a, b in zip(jax.tree.leaves(trained), jax.tree.leaves(ex1.state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_corrupt_checkpoint_degrades_gracefully(tmp_path):
    """Fault injection: an unreadable last_ckp must not wedge auto-resume —
    training falls back to best_ckp, and with both corrupt starts fresh
    (with loud warnings), instead of crashing at startup forever."""
    import numpy as np

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1)
    config = get_config(yaml_path)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()

    def corrupt(name):
        root = os.path.join(save, name)
        for dirpath, _, files in os.walk(root):
            for f in files:
                with open(os.path.join(dirpath, f), "wb") as fh:
                    fh.write(b"garbage")

    corrupt("last_ckp")
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    assert int(ex.state.epoch) == 1  # resumed from best_ckp

    corrupt("best_ckp")
    ex2 = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    assert int(ex2.state.epoch) == 0  # fresh start, not a crash
    # fresh init params, not garbage
    assert np.isfinite(
        np.asarray(jax.tree.leaves(ex2.state.params)[0])
    ).all()
