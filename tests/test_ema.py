"""EMA weights (`EMA_DECAY`): averaged params maintained inside the train
step, persisted in checkpoints, preferred by eval/predict/serve.

The production T5/VLM recipe the reference lacks: decode quality comes from
the exponential moving average of the weights, not the last noisy SGD
iterate. Pins: the exact recurrence, checkpoint round-trip + EVAL_EMA
routing, zero footprint when off, and knob validation.
"""

import jax
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import Config, get_config
from phoneme_vqa_tpu.data.loader import batch_iterator
from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
from phoneme_vqa_tpu.utils.registry import EXECUTORS

DECAY = 0.5


def _make_executor(tmp_path, **kw):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(paths, str(tmp_path / "ck"), **kw)
    config = get_config(yaml_path)
    return EXECUTORS.get(config.EXECUTOR)(config, mode="train"), config


def _first_batch(ex, config):
    batch, _ = next(iter(batch_iterator(
        ex.train_data, config.TRAIN_BATCH_SIZE, shuffle=False, drop_last=True
    )))
    return ex._shard(batch)


def test_ema_recurrence(tmp_path):
    """ema_t = d * ema_{t-1} + (1-d) * params_t, seeded at params_0."""
    ex, config = _make_executor(
        tmp_path, NUM_EPOCHS=1, SAVE=False, EMA_DECAY=DECAY
    )
    host = lambda tree: jax.tree.map(lambda x: np.array(x, np.float64), tree)
    expect = host(ex.state.params)  # seeded from init params
    batch = _first_batch(ex, config)
    for _ in range(2):
        ex.state, _ = ex.train_step(ex.state, batch)
        p = host(ex.state.params)
        expect = jax.tree.map(
            lambda e, q: e * DECAY + q * (1 - DECAY)
            if np.issubdtype(q.dtype, np.floating) else q,
            expect, p,
        )
    got = host(ex.state.ema_params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(expect)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    # EMA differs from raw params after a step (it actually averages)
    diffs = [
        float(np.max(np.abs(a - b)))
        for a, b in zip(
            jax.tree.leaves(got), jax.tree.leaves(host(ex.state.params))
        )
    ]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip_and_eval_routing(tmp_path):
    """Checkpoints carry the average; eval loads it by default and the raw
    weights under EVAL_EMA: false; mid-train decode uses the average too."""
    ex, config = _make_executor(
        tmp_path, NUM_EPOCHS=1, SAVE=True, EMA_DECAY=DECAY,
    )
    batch = _first_batch(ex, config)
    ex.state, _ = ex.train_step(ex.state, batch)
    ex._save_checkpoint("last")
    ex.ckpt.wait()
    want_ema = jax.tree.map(np.asarray, ex.state.ema_params)
    want_raw = jax.tree.map(np.asarray, ex.state.params)
    # mid-train inference params come from the average
    inf = jax.tree.map(np.asarray, ex._inference_params())
    for a, b in zip(jax.tree.leaves(inf), jax.tree.leaves(want_ema)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-2
        )

    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last")
    ev._load_trained_checkpoint("last")
    got = jax.tree.map(np.asarray, ev.state.params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want_ema)):
        np.testing.assert_allclose(a, b, atol=1e-6)

    raw_cfg = Config(dict(config, EVAL_EMA=False))
    ev2 = EXECUTORS.get(config.EXECUTOR)(raw_cfg, mode="eval", evaltype="last")
    ev2._load_trained_checkpoint("last")
    got2 = jax.tree.map(np.asarray, ev2.state.params)
    for a, b in zip(jax.tree.leaves(got2), jax.tree.leaves(want_raw)):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # resume restores the average
    ex2 = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    got3 = jax.tree.map(np.asarray, ex2.state.ema_params)
    for a, b in zip(jax.tree.leaves(got3), jax.tree.leaves(want_ema)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_ema_off_is_zero_footprint(tmp_path):
    ex, config = _make_executor(tmp_path, NUM_EPOCHS=1, SAVE=False)
    assert ex.state.ema_params is None
    assert "ema_params" not in ex._ckpt_tree()
    batch = _first_batch(ex, config)
    ex.state, _ = ex.train_step(ex.state, batch)
    assert ex.state.ema_params is None


def test_ema_decay_validation():
    from phoneme_vqa_tpu.train.base_executor import BaseExecutor

    ex = object.__new__(BaseExecutor)
    ex.config = Config({"EMA_DECAY": 1.0})
    with pytest.raises(ValueError, match="EMA_DECAY"):
        ex._ema_decay()
    ex.config = Config({"EMA_DECAY": 0.999})
    assert ex._ema_decay() == 0.999
    ex.config = Config({})
    assert ex._ema_decay() == 0.0
