"""VIT_CACHE: frozen-ViT encoding cache (data/vit_cache.py).

The reference recomputes the frozen ViT forward every train step / eval
batch (`/root/reference/core/model/LaTr.py:54-56` freezes it, `:85-97` runs
it per forward). The cache must be EXACT (same weights, no dropout), dedup
by image, and refuse to attach when the ViT can change under it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.loader import ArrayDataset
from phoneme_vqa_tpu.data.vit_cache import attach_vit_cache
from phoneme_vqa_tpu.models.latr import LaTr, LaTrConfig
from phoneme_vqa_tpu.models.t5 import T5Config
from phoneme_vqa_tpu.models.vit import ViTConfig
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml

TINY_T5 = T5Config(
    vocab_size=53, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_layers=2, num_decoder_layers=2, dropout_rate=0.0, dtype=jnp.float32,
)
TINY_VIT = ViTConfig(
    image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4,
    mlp_dim=64, dtype=jnp.float32,
)


def _latr_batch(b=3, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": rng.randn(b, 3, 32, 32).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (b, 5, 6)).astype(np.int32),
        "input_ids": rng.randint(3, 53, (b, 4)).astype(np.int32),
        "src_attention_mask": np.ones((b, 4), np.int32),
        "ocr_attention_mask": np.ones((b, 5), np.int32),
        "tokenized_ocr": rng.randint(3, 53, (b, 5)).astype(np.int32),
    }


def test_cached_encodings_reproduce_pixel_forward_exactly():
    """model(batch with vit_encodings) == model(batch with pixel_values) —
    bit-exact in f32: the cache stores exactly what the in-step ViT emits."""
    model = LaTr(LaTrConfig(t5=TINY_T5, vit=TINY_VIT))
    batch = _latr_batch()
    labels = np.array([[0, 5, 6], [0, 7, 8], [0, 9, 4]], np.int32)
    mask = np.ones_like(labels)
    params = model.init(jax.random.PRNGKey(0), batch, labels, mask)["params"]

    logits_pix = model.apply({"params": params}, batch, labels, mask)
    enc = model.apply(
        {"params": params}, batch["pixel_values"], method="encode_image"
    )
    batch_enc = {k: v for k, v in batch.items() if k != "pixel_values"}
    batch_enc["vit_encodings"] = np.asarray(enc)
    logits_enc = model.apply({"params": params}, batch_enc, labels, mask)
    np.testing.assert_array_equal(
        np.asarray(logits_pix), np.asarray(logits_enc)
    )


def test_attach_dedups_by_image_and_swaps_lazy_field():
    """One encoder pass per UNIQUE image; gather returns each row's own
    image encoding; pixel_values disappears from the lazy fields."""
    n_rows, n_uniq = 8, 3
    image_ids = [float(r % n_uniq) for r in range(n_rows)]
    loads = []

    def pixel_loader(idx):
        loads.extend(int(i) for i in idx)
        # pixel payload encodes the image id so the "encoder" is checkable
        return np.stack(
            [np.full((2, 2), image_ids[int(i)], np.float32) for i in idx]
        )

    ds = ArrayDataset(
        {"x": np.arange(n_rows)},
        image_ids=image_ids,
        lazy_fields={"pixel_values": pixel_loader},
    )
    encode_calls = []

    def encode_fn(pix):
        encode_calls.append(len(pix))
        return pix * 10.0  # stand-in "encoding"

    ok, reason = attach_vit_cache(ds, encode_fn, batch_size=2)
    assert ok, reason
    assert "pixel_values" not in ds.lazy_fields
    # 3 unique images at precompute batch 2 -> 2 padded chunks of 2
    assert encode_calls == [2, 2]
    # every precompute load was a representative row of a unique image
    assert len(set(image_ids[i] for i in loads)) == n_uniq

    batch = ds.gather(np.array([0, 4, 5]))  # images 0.0, 1.0, 2.0
    np.testing.assert_array_equal(
        batch["vit_encodings"][:, 0, 0], [0.0, 10.0, 20.0]
    )
    # idempotent: re-attach is a no-op, not a second precompute
    ok2, reason2 = attach_vit_cache(ds, encode_fn, batch_size=2)
    assert ok2 and reason2 == "already attached"
    assert encode_calls == [2, 2]


def test_attach_respects_size_cap():
    ds = ArrayDataset(
        {"x": np.arange(4)},
        image_ids=[0.0, 1.0, 2.0, 3.0],
        lazy_fields={"pixel_values": lambda idx: np.zeros((len(idx), 2, 2), np.float32)},
    )
    ok, reason = attach_vit_cache(
        ds, lambda pix: pix.astype(np.float32), batch_size=2, max_bytes=8
    )
    assert not ok and "GiB" in reason
    assert "pixel_values" in ds.lazy_fields  # untouched on refusal


@pytest.mark.slow
def test_latr_train_and_eval_identical_with_cache(tmp_path):
    """Full executor equality: training with VIT_CACHE produces the same
    eval answers and near-identical parameters. The fuse output is bit-exact
    (test above), but the cached TRAIN STEP is a different XLA program (no
    ViT subgraph): gradient fusion order differs in the last ulp (~4e-9,
    measured on XLA:CPU), and adam's rsqrt(nu) amplifies that noise to
    ~5e-5 relative on a handful of elements after the update. Answers are
    compared exactly; params to 1e-3 relative — loose enough for the ulp
    physics, tight enough that wrong/stale encodings (which move losses at
    1e-1 scale) would still fail."""

    def run(subdir, **overrides):
        paths = make_latr_fixture(tmp_path / subdir)
        save = str(tmp_path / subdir / "ckpts")
        cfg = get_config(tiny_latr_yaml(paths, save, NUM_EPOCHS=1, **overrides))
        ex = EXECUTORS.get(cfg.EXECUTOR)(cfg, mode="train")
        ex.run()
        answers = ex.infer(ex.val_data, cfg.EVAL_BATCH_SIZE, cfg.max_eval_length)
        return ex, answers

    ex_a, ans_a = run("plain")
    ex_b, ans_b = run("cached", VIT_CACHE=True)
    assert "vit_encodings" in ex_b.train_data.lazy_fields
    assert "pixel_values" not in ex_b.val_data.lazy_fields
    assert ans_a == ans_b
    leaves_a = jax.tree.leaves(ex_a.state.params)
    leaves_b = jax.tree.leaves(ex_b.state.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_frozen_vit_immune_to_weight_decay(tmp_path):
    """The reference freezes its ViT with requires_grad=False
    (LaTr.py:54-56): no optimizer rule ever touches it. stop_gradient alone
    does NOT reproduce that under decoupled weight decay (adamw decays every
    param regardless of gradient) — the optimizer must mask the vit subtree
    (BaseExecutor._freeze_predicate), or the 'frozen' weights drift and
    VIT_CACHE's train-mode encodings go silently stale."""
    paths = make_latr_fixture(tmp_path)
    cfg = get_config(tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        OPTIMIZER="adamw", WEIGHT_DECAY=0.1,
    ))
    ex = EXECUTORS.get(cfg.EXECUTOR)(cfg, mode="train")
    # materialize BEFORE training: the donated train step deletes the
    # original buffers
    vit_before = jax.tree.map(np.asarray, ex.state.params["vit"])
    t5_before = jax.tree.map(np.asarray, ex.state.params["t5"])
    ex._train_epoch(1)
    vit_after = jax.tree.map(np.asarray, ex.state.params["vit"])
    for a, b in zip(jax.tree.leaves(vit_before), jax.tree.leaves(vit_after)):
        np.testing.assert_array_equal(a, b)  # bit-identical: truly frozen
    # ... while the trainable rest actually moved
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(t5_before),
            jax.tree.leaves(ex.state.params["t5"]),
        )
    )
    assert moved


@pytest.mark.slow
def test_prestu_train_mode_refuses_cache(tmp_path, caplog):
    """PreSTU trains its ViT (the reference freezes only the LaTr family) —
    train-mode caching must refuse; eval mode (static weights) attaches."""
    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ckpts")
    yaml_path = tiny_latr_yaml(
        paths, save,
        EXECUTOR="PreSTU_Executor", MODEL_CLASS="PreSTU",
        MODEL_MOD_CONFIG_CLASS="PreSTU_config",
        VIT_CACHE=True, NUM_EPOCHS=1,
    )
    cfg = get_config(yaml_path)
    ex = EXECUTORS.get(cfg.EXECUTOR)(cfg, mode="train")
    ex._maybe_attach_vit_cache(("train_data", "val_data"))
    assert "pixel_values" in ex.train_data.lazy_fields
    assert "pixel_values" in ex.val_data.lazy_fields

    ex.run()
    ev = EXECUTORS.get(cfg.EXECUTOR)(cfg, mode="eval", evaltype="last")
    scores = ev.run()
    assert "pixel_values" not in ev.val_data.lazy_fields
    ev_plain = EXECUTORS.get(cfg.EXECUTOR)(
        get_config(tiny_latr_yaml(
            paths, save,
            EXECUTOR="PreSTU_Executor", MODEL_CLASS="PreSTU",
            MODEL_MOD_CONFIG_CLASS="PreSTU_config", NUM_EPOCHS=1,
        )),
        mode="eval", evaltype="last",
    )
    assert ev_plain.run() == scores
