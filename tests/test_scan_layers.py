"""SCAN_LAYERS: scanned layer stacks match the unrolled stacks exactly.

`T5Config.scan_layers` / `ViTConfig.scan_layers` compile each transformer
stack as one `lax.scan` over (num_layers,)-stacked block params instead of
unrolling the blocks into the XLA program — same math, ~num_layers× less
code to compile (measured in docs/DESIGN.md). These tests pin:

* the param layout round trip (`scan_utils.stack/unstack_block_params`)
* forward / decode / gradient parity against the unrolled stack
* HF import and executor checkpoint-resume working across both layouts
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.models.latr import LaTr, LaTrConfig
from phoneme_vqa_tpu.models.scan_utils import (
    has_scanned_blocks,
    stack_block_params,
    unstack_block_params,
)
from phoneme_vqa_tpu.models.t5 import T5, T5Config
from phoneme_vqa_tpu.models.vit import ViTConfig

TINY = T5Config(
    vocab_size=53,
    d_model=32,
    d_kv=8,
    num_heads=4,
    d_ff=64,
    num_layers=3,
    num_decoder_layers=3,
    dropout_rate=0.0,
    dtype=jnp.float32,
)
TINY_VIT = ViTConfig(
    image_size=32, patch_size=16, hidden_size=32, num_layers=3, num_heads=4,
    mlp_dim=64, dtype=jnp.float32,
)

TOL = 5e-6


@pytest.fixture(scope="module")
def pair():
    """(unrolled params, inputs): scanned params derive via stacking."""
    model = T5(TINY)
    b, l_enc, t = 2, 7, 6
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, l_enc, TINY.d_model))
    enc_mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]])
    dec_ids = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, TINY.vocab_size)
    params = model.init(jax.random.PRNGKey(0), embeds, dec_ids, enc_mask)["params"]
    return params, embeds, enc_mask, dec_ids


def _allclose(a, b, tol=TOL):
    assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < tol


def test_layout_round_trip(pair):
    params, *_ = pair
    stacked = stack_block_params(params)
    assert has_scanned_blocks(stacked) and not has_scanned_blocks(params)
    back = unstack_block_params(stacked)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_parity(pair):
    params, embeds, enc_mask, dec_ids = pair
    scanned = stack_block_params(params)
    o_unroll = T5(TINY).apply({"params": params}, embeds, dec_ids, enc_mask)
    o_scan = T5(TINY.replace(scan_layers=True)).apply(
        {"params": scanned}, embeds, dec_ids, enc_mask
    )
    _allclose(o_unroll, o_scan)


def test_decode_step_parity(pair):
    params, embeds, enc_mask, dec_ids = pair
    scanned = stack_block_params(params)
    m0, m1 = T5(TINY), T5(TINY.replace(scan_layers=True))
    max_len = 6
    outs = []
    for m, p in ((m0, params), (m1, scanned)):
        enc = m.apply({"params": p}, embeds, enc_mask, method=T5.encode)
        cache, bias = m.apply({"params": p}, enc, max_len, method=T5.init_cache)
        toks = jnp.zeros((2,), jnp.int32)
        logits_seq = []
        for i in range(3):
            logits, cache = m.apply(
                {"params": p}, toks, cache, jnp.int32(i), bias, enc_mask,
                method=T5.decode_step,
            )
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            logits_seq.append(logits)
        outs.append(jnp.stack(logits_seq))
    _allclose(outs[0], outs[1])


@pytest.mark.parametrize(
    "remat",
    [pytest.param(False, marks=pytest.mark.slow), True],
)
def test_grad_parity(pair, remat):
    params, embeds, enc_mask, dec_ids = pair
    scanned = stack_block_params(params)

    def loss(p, model):
        lg = model.apply({"params": p}, embeds, dec_ids, enc_mask)
        return jnp.mean(lg**2)

    g_unroll = stack_block_params(jax.grad(loss)(params, T5(TINY)))
    g_scan = jax.grad(loss)(
        scanned, T5(TINY.replace(scan_layers=True, remat=remat))
    )
    assert jax.tree.structure(g_unroll) == jax.tree.structure(g_scan)
    for a, b in zip(jax.tree.leaves(g_unroll), jax.tree.leaves(g_scan)):
        _allclose(a, b)


def test_latr_full_model_parity():
    """ViT + T5 scanned together through the uniform model surface."""
    b = 2
    batch = {
        "pixel_values": jax.random.normal(jax.random.PRNGKey(3), (b, 3, 32, 32)),
        "coordinates": jnp.zeros((b, 4, 6), jnp.int32),
        "input_ids": jnp.ones((b, 3), jnp.int32),
        "src_attention_mask": jnp.ones((b, 3), jnp.int32),
        "ocr_attention_mask": jnp.ones((b, 4), jnp.int32),
        "tokenized_ocr": jnp.ones((b, 4), jnp.int32),
    }
    labels = jnp.ones((b, 3), jnp.int32)
    lmask = jnp.ones((b, 3), jnp.int32)
    m0 = LaTr(LaTrConfig(t5=TINY, vit=TINY_VIT))
    m1 = LaTr(
        LaTrConfig(
            t5=TINY.replace(scan_layers=True),
            vit=TINY_VIT.replace(scan_layers=True),
        )
    )
    params = m0.init(jax.random.PRNGKey(0), batch, labels, lmask)["params"]
    scanned = stack_block_params(params)
    _allclose(
        m0.apply({"params": params}, batch, labels, lmask),
        m1.apply({"params": scanned}, batch, labels, lmask),
    )
    c0 = m0.apply({"params": params}, batch, 5, method=m0.encode_for_generate)
    c1 = m1.apply({"params": scanned}, batch, 5, method=m1.encode_for_generate)
    _allclose(c0[0]["ck"], c1[0]["ck"])


@pytest.mark.slow
def test_checkpoint_resumes_across_layouts(tmp_path):
    """A run trained UNROLLED resumes into a SCAN_LAYERS executor: the
    full-state restore fails on the layout mismatch and the params-only
    salvage converts block_{i} -> stacked blocks (base_executor)."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_unrolled = tiny_latr_yaml(paths, save, NUM_EPOCHS=1)
    config = get_config(yaml_unrolled)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()

    yaml_scan = tiny_latr_yaml(paths, save, NUM_EPOCHS=1, SCAN_LAYERS=True)
    ex2 = EXECUTORS.get(get_config(yaml_scan).EXECUTOR)(
        get_config(yaml_scan), mode="train"
    )
    assert has_scanned_blocks(ex2.state.params)
    raw = ex2.ckpt.restore_raw("last")
    want = stack_block_params(
        jax.tree.map(np.asarray, raw["params"])
    )
    got_leaves = jax.tree.leaves(ex2.state.params)
    want_leaves = jax.tree.leaves(want)
    assert len(got_leaves) == len(want_leaves)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ex2.state.epoch) == 1  # resumed, not fresh


def test_hf_import_into_scanned_layout():
    """import_t5_params on a scanned tree == import on unrolled, then stack."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    from phoneme_vqa_tpu.models.hf_import import import_t5_params

    hf_cfg = HFT5Config(
        vocab_size=TINY.vocab_size,
        d_model=TINY.d_model,
        d_kv=TINY.d_kv,
        num_heads=TINY.num_heads,
        d_ff=TINY.d_ff,
        num_layers=TINY.num_layers,
        num_decoder_layers=TINY.num_decoder_layers,
        feed_forward_proj="gated-gelu",
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    sd = {
        k: v.detach().numpy()
        for k, v in T5ForConditionalGeneration(hf_cfg).state_dict().items()
    }

    embeds = jnp.zeros((1, 4, TINY.d_model))
    dec = jnp.zeros((1, 3), jnp.int32)
    p_unroll = T5(TINY).init(jax.random.PRNGKey(0), embeds, dec)["params"]
    p_scan = stack_block_params(p_unroll)

    got_unroll = stack_block_params(import_t5_params(p_unroll, dict(sd)))
    got_scan = import_t5_params(p_scan, dict(sd))
    assert jax.tree.structure(got_unroll) == jax.tree.structure(got_scan)
    for a, b in zip(jax.tree.leaves(got_unroll), jax.tree.leaves(got_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
