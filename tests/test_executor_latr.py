"""End-to-end LaTr executor: train 1 epoch -> eval -> predict on synthetic
fixtures (the integration test the reference never had; SURVEY §4)."""

import json
import os

import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml



pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("latr_fixture")
    paths = make_latr_fixture(root)
    save_path = str(root / "ckpts")
    yaml_path = tiny_latr_yaml(paths, save_path, NUM_EPOCHS=2)
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    executor.run()
    return config, yaml_path, save_path


def test_train_saves_checkpoints(trained):
    _, _, save_path = trained
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    assert os.path.isdir(os.path.join(save_path, "best_ckp"))


def test_eval_mode(trained):
    config, _, _ = trained
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last")
    scores = executor.run()
    assert set(scores) == {"F1", "Accuracy", "CIDEr", "ROUGE", "BLEU"}
    assert 0.0 <= scores["Accuracy"] <= 1.0


def test_eval_mode_defers_param_init(trained):
    """Non-train executors build the param tree ABSTRACTLY at construction
    (eval/predict/serve restore a checkpoint before any decode — a real
    on-device random init would be pure wasted startup, ~2 min at base
    scale); a checkpoint restore materializes it, and executors that never
    restore (serve --ckpt none, tests) materialize lazily at first use
    with identical behavior."""
    import jax

    config, _, _ = trained
    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last")
    assert all(
        isinstance(x, jax.ShapeDtypeStruct)
        for x in jax.tree.leaves(ev.state.params)
    )
    ev._load_trained_checkpoint("last")
    leaves = jax.tree.leaves(ev.state.params)
    assert not any(isinstance(x, jax.ShapeDtypeStruct) for x in leaves)
    got = ev.infer(ev.val_data, config.EVAL_BATCH_SIZE, 8)
    assert len(got) == len(ev.val_data)

    # lazy path: no restore — first inference materializes random init
    ev2 = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    got2 = ev2.infer(ev2.val_data, config.EVAL_BATCH_SIZE, 8)
    assert len(got2) == len(ev2.val_data)
    assert not any(
        isinstance(x, jax.ShapeDtypeStruct)
        for x in jax.tree.leaves(ev2.state.params)
    )
    # materializing twice is a no-op (same tree object)
    assert ev2._ensure_params() is ev2.state.params


def test_nontrain_restore_casts_bf16_hostside(tmp_path):
    """bf16-model eval/serve restores cast the f32 checkpoint masters
    HOST-side, so the device never holds the f32 tree (half the restore
    H2D bytes and serving HBM) — and answers are identical to the
    train-mode executor's cast-at-inference path (both casts are
    round-to-nearest-even)."""
    import jax
    import jax.numpy as jnp

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, DTYPE="bfloat16",
        max_eval_length=8,
    )
    config = get_config(yaml_path)
    tr = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tr.run()
    want = tr.infer(tr.val_data, config.EVAL_BATCH_SIZE, 8)

    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last")
    ev._load_trained_checkpoint("last")
    leaves = [x for x in jax.tree.leaves(ev.state.params) if hasattr(x, "dtype")]
    assert not any(x.dtype == np.float32 for x in leaves)
    assert any(x.dtype == jnp.bfloat16 for x in leaves)
    got = ev.infer(ev.val_data, config.EVAL_BATCH_SIZE, 8)
    assert got == want


def test_predict_mode_writes_results(trained):
    config, _, save_path = trained
    executor = EXECUTORS.get(config.EXECUTOR)(
        config, mode="predict", predicttype="best"
    )
    results = executor.run()
    out = os.path.join(save_path, "results.json")
    assert os.path.isfile(out)
    data = json.load(open(out, encoding="utf-8"))
    assert len(data) == 6
    assert set(data[0]) == {"gens", "gts"}


def test_resume_from_last(trained):
    """Re-instantiating the train executor resumes from last_ckp with the
    exact trained parameter values (not a fresh init)."""
    import jax

    config, _, _ = trained
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    assert int(executor.state.epoch) == 2
    assert executor.best_score >= 0.0
    # params differ from a fresh random init and match the saved ones
    fresh = executor._init_params()
    restored_leaf = np.asarray(jax.tree.leaves(executor.state.params)[0])
    fresh_leaf = np.asarray(jax.tree.leaves(fresh)[0])
    assert not np.array_equal(restored_leaf, fresh_leaf)
    raw = executor.ckpt.restore_raw("last")
    saved_leaf = np.asarray(jax.tree.leaves(raw["params"])[0])
    np.testing.assert_array_equal(restored_leaf, saved_leaf)


def test_training_reduces_loss(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck2"), NUM_EPOCHS=1, LR=3e-3)
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    losses = []
    for epoch in range(1, 4):
        losses.append(executor._train_epoch(epoch))
    assert losses[-1] < losses[0], losses


def test_prefetch_numworkers(tmp_path):
    """NUMWORKERS>0 routes batches through the background prefetch thread."""
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=1, NUMWORKERS=2)
    config = get_config(yaml_path)
    executor = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    loss = executor._train_epoch(1)
    assert np.isfinite(loss)
    preds = executor.infer(executor.val_data, 8, 6)
    assert len(preds) == 6


def test_predict_without_score(tmp_path):
    """get_predict_score=False writes results.json with gens only."""
    import json

    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save_path, NUM_EPOCHS=1, get_predict_score=False)
    config = get_config(yaml_path)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()
    results = EXECUTORS.get(config.EXECUTOR)(config, mode="predict").run()
    data = json.load(open(os.path.join(save_path, "results.json"), encoding="utf-8"))
    assert len(data) == 6 and set(data[0]) == {"gens"}


def test_bfloat16_end_to_end(tmp_path):
    """The bench's bf16 compute path trains and infers (CPU)."""
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=1,
                               DTYPE="bfloat16")
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    loss = ex._train_epoch(1)
    assert np.isfinite(loss)
    preds = ex.infer(ex.val_data, 8, 6)
    assert len(preds) == 6


def test_validate_loss(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=1)
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    # val set has 6 rows < EVAL_BATCH_SIZE 8 with drop_last -> use batch 4... use 2
    loss = ex.validate_loss(batch_size=2)
    assert np.isfinite(loss) and loss > 0


def test_metrics_jsonl_written(tmp_path):
    import json as _json

    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save_path, NUM_EPOCHS=2)
    config = get_config(yaml_path)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()
    lines = open(os.path.join(save_path, "metrics.jsonl"), encoding="utf-8").read().splitlines()
    assert len(lines) == 2
    rec = _json.loads(lines[-1])
    assert rec["epoch"] == 2 and "train_loss" in rec and "Accuracy" in rec
    assert "val_loss" not in rec  # knob off by default


def test_val_loss_knob(tmp_path):
    """VAL_LOSS: true records the per-epoch teacher-forced validation loss in
    metrics.jsonl (wires validate_loss into the training loop)."""
    import json as _json

    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(
        paths, save_path, NUM_EPOCHS=1, VAL_LOSS=True, EVAL_BATCH_SIZE=2
    )
    config = get_config(yaml_path)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()
    rec = _json.loads(
        open(os.path.join(save_path, "metrics.jsonl"), encoding="utf-8")
        .read().splitlines()[-1]
    )
    assert np.isfinite(rec["val_loss"]) and rec["val_loss"] > 0


def test_kernel_knobs_from_config(tmp_path):
    """FLASH / SAL_FUSED yaml knobs drive the attention dispatch globals."""
    from phoneme_vqa_tpu.ops import attention as attn

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=1,
                               FLASH=False, SAL_FUSED=False)
    config = get_config(yaml_path)
    before = (attn.FLASH_ENABLED, attn.SAL_FUSED_ENABLED)
    try:
        EXECUTORS.get(config.EXECUTOR)(config, mode="train")
        assert attn.FLASH_ENABLED is False
        assert attn.SAL_FUSED_ENABLED is False
    finally:
        attn.enable_flash(before[0])
        attn.enable_sal_fused(before[1])


def test_save_every_steps_preemption_cadence(tmp_path):
    """SAVE_EVERY_STEPS refreshes last_ckp mid-epoch (preemption safety);
    resume stays epoch-granular."""
    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save_path, NUM_EPOCHS=1,
                               SAVE_EVERY_STEPS=1, TRAIN_BATCH_SIZE=4)
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    # run the bare epoch (no eval) — mid-epoch saves must appear
    ex._train_epoch(1)
    ex.ckpt.wait()
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    restored = ex.ckpt.restore_raw("last")
    # saved state reflects mid-training steps, not the initial state
    assert int(restored["step"]) >= 1


def test_early_stop_patience(tmp_path):
    """EARLY_STOP_PATIENCE: training halts after N epochs without an
    Accuracy improvement; without the knob it runs the full NUM_EPOCHS.
    LR=0 freezes the model so the metric cannot improve after epoch 1."""
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=6,
                               LR=0.0, EARLY_STOP_PATIENCE=2)
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    # acc is constant: best_epoch is at most 1, stop fires by epoch 3
    assert int(ex.state.epoch) <= 3, int(ex.state.epoch)


def test_predict_scores_confidence_in_results(tmp_path):
    """PREDICT_SCORES: true attaches a per-answer confidence in (0, 1] to
    every results.json row, on both predict paths (with and without
    get_predict_score); the reference schema is otherwise unchanged."""
    import json

    paths = make_latr_fixture(tmp_path)
    for scored in (True, False):
        save = str(tmp_path / f"ck_{scored}")
        yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1,
                                   PREDICT_SCORES=True,
                                   get_predict_score=scored)
        config = get_config(yaml_path)
        EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()
        EXECUTORS.get(config.EXECUTOR)(config, mode="predict").run()
        rows = json.load(open(os.path.join(save, "results.json")))
        assert rows and all("confidence" in r for r in rows)
        assert all(0.0 < r["confidence"] <= 1.0 for r in rows), rows[:2]
        assert all("gens" in r for r in rows)
        if scored:
            assert all("gts" in r for r in rows)
