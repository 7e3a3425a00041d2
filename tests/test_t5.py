"""T5 stack correctness: cache consistency, greedy decode semantics, LaTr e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.greedy import greedy_decode
from phoneme_vqa_tpu.models.latr import LaTr, LaTrConfig, make_generate_fn
from phoneme_vqa_tpu.models.t5 import T5, T5Config
from phoneme_vqa_tpu.models.vit import ViT, ViTConfig

TINY_T5 = T5Config(
    vocab_size=53,
    d_model=32,
    d_kv=8,
    num_heads=4,
    d_ff=64,
    num_layers=2,
    num_decoder_layers=2,
    dropout_rate=0.0,
    dtype=jnp.float32,
)
TINY_VIT = ViTConfig(
    image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4,
    mlp_dim=64, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def t5_setup():
    model = T5(TINY_T5)
    rng = jax.random.PRNGKey(0)
    b, l_enc, t = 2, 7, 6
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, l_enc, TINY_T5.d_model))
    enc_mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]])
    dec_ids = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, TINY_T5.vocab_size)
    variables = model.init(rng, embeds, dec_ids, enc_mask)
    return model, variables["params"], embeds, enc_mask, dec_ids


def test_cache_matches_teacher_forcing(t5_setup):
    """Step-by-step cached decode logits == full teacher-forced logits."""
    model, params, embeds, enc_mask, dec_ids = t5_setup
    enc_out = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)
    full_logits = model.apply(
        {"params": params}, dec_ids, enc_out, enc_mask, None, method=T5.decode
    )

    t = dec_ids.shape[1]
    cache, full_bias = model.apply(
        {"params": params}, enc_out, t, method=T5.init_cache
    )
    step_logits = []
    for i in range(t):
        logits, cache = model.apply(
            {"params": params},
            dec_ids[:, i],
            cache,
            jnp.int32(i),
            full_bias,
            enc_mask,
            method=T5.decode_step,
        )
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_greedy_decode_matches_naive(t5_setup):
    """`greedy_decode` (while_loop) == naive per-step re-decode greedy."""
    model, params, embeds, enc_mask, _ = t5_setup
    cfg = TINY_T5
    max_len = 8
    enc_out = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)

    # naive: full re-decode each step (the reference Customized* regime)
    b = embeds.shape[0]
    ys = np.full((b, 1), cfg.decoder_start_token_id, np.int32)
    finished = np.zeros(b, bool)
    for _ in range(max_len - 1):
        logits = model.apply(
            {"params": params}, jnp.asarray(ys), enc_out, enc_mask, None,
            method=T5.decode,
        )
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1), np.int32)
        nxt = np.where(finished, cfg.pad_token_id, nxt)
        ys = np.concatenate([ys, nxt[:, None]], 1)
        finished |= nxt == cfg.eos_token_id
        if finished.all():
            break
    naive = np.full((b, max_len), cfg.pad_token_id, np.int32)
    naive[:, : ys.shape[1]] = ys

    # cached while_loop greedy
    cache, full_bias = model.apply({"params": params}, enc_out, max_len, method=T5.init_cache)

    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, full_bias, enc_mask,
            method=T5.decode_step,
        )

    fast = greedy_decode(
        step, cache, b, max_len, cfg.decoder_start_token_id, cfg.eos_token_id,
        cfg.pad_token_id,
    )
    np.testing.assert_array_equal(np.asarray(fast), naive)


def test_injected_position_bias_changes_encoding(t5_setup):
    model, params, embeds, enc_mask, _ = t5_setup
    base = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)
    l = embeds.shape[1]
    bias = jnp.ones((1, TINY_T5.num_heads, l, l)) * 2.0
    injected = model.apply(
        {"params": params}, embeds, enc_mask, bias, method=T5.encode
    )
    assert not np.allclose(np.asarray(base), np.asarray(injected))
    assert injected.shape == base.shape


def test_vit_shapes():
    vit = ViT(TINY_VIT)
    x = jnp.zeros((2, 3, 32, 32))
    params = vit.init(jax.random.PRNGKey(0), x)
    out = vit.apply(params, x)
    assert out.shape == (2, TINY_VIT.seq_len, TINY_VIT.hidden_size)
    assert TINY_VIT.seq_len == 5  # 4 patches + CLS


def _latr_batch(b=2, l_ocr=5, l_q=4):
    rng = np.random.RandomState(0)
    return {
        "pixel_values": jnp.asarray(rng.randn(b, 3, 32, 32), jnp.float32),
        "coordinates": jnp.asarray(rng.randint(0, 1000, (b, l_ocr, 6)), jnp.int32),
        "input_ids": jnp.asarray(rng.randint(0, 53, (b, l_q)), jnp.int32),
        "src_attention_mask": jnp.ones((b, l_q), jnp.int32),
        "ocr_attention_mask": jnp.ones((b, l_ocr), jnp.int32),
        "tokenized_ocr": jnp.asarray(rng.randint(0, 53, (b, l_ocr)), jnp.int32),
    }


def test_latr_forward_and_generate():
    cfg = LaTrConfig(t5=TINY_T5, vit=TINY_VIT, max_2d_position_embeddings=1024)
    model = LaTr(cfg)
    batch = _latr_batch()
    labels = jnp.asarray([[0, 5, 6, 7], [0, 8, 9, 1]], jnp.int32)
    label_mask = jnp.ones_like(labels)
    params = model.init(jax.random.PRNGKey(0), batch, labels, label_mask)["params"]
    logits = model.apply({"params": params}, batch, labels, label_mask)
    assert logits.shape == (2, 4, TINY_T5.vocab_size)

    gen = jax.jit(make_generate_fn(model, max_length=6))
    out = gen(params, batch)
    assert out.shape == (2, 6)
    assert np.all(np.asarray(out[:, 0]) == TINY_T5.decoder_start_token_id)


def test_prestu_forward_and_generate():
    from phoneme_vqa_tpu.models.prestu import PreSTU

    cfg = LaTrConfig(t5=TINY_T5, vit=TINY_VIT, freeze_vit=False)
    model = PreSTU(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(2, 3, 32, 32), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(0, 53, (2, 9)), jnp.int32),
        "src_attention_mask": jnp.ones((2, 9), jnp.int32),
    }
    labels = jnp.asarray([[0, 5, 6], [0, 8, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch, labels, jnp.ones_like(labels))[
        "params"
    ]
    logits = model.apply({"params": params}, batch, labels, jnp.ones_like(labels))
    assert logits.shape == (2, 3, TINY_T5.vocab_size)
    out = jax.jit(make_generate_fn(model, max_length=5))(params, batch)
    assert out.shape == (2, 5)


def test_dropout_active_in_training_mode():
    """Non-deterministic forward with different dropout rngs gives different
    logits; deterministic mode is rng-independent."""
    cfg = TINY_T5.replace(dropout_rate=0.3)
    model = T5(cfg)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.d_model))
    dec_ids = jnp.zeros((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, dec_ids)["params"]

    def fwd(rng):
        return model.apply(
            {"params": params}, embeds, dec_ids, None, None, None, False,
            rngs={"dropout": rng},
        )

    a = fwd(jax.random.PRNGKey(1))
    b = fwd(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    det = model.apply({"params": params}, embeds, dec_ids)
    det2 = model.apply({"params": params}, embeds, dec_ids)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))


@pytest.mark.slow
def test_remat_matches_no_remat():
    """REMAT (gradient checkpointing) must not change loss, grads, or decode
    — it only trades recompute for activation memory. Slow tier: pure
    redundancy parity (38 s of compile); the remat flag's plumbing is still
    exercised fast by test_scan_layers.test_grad_parity[True]."""
    from phoneme_vqa_tpu.models.generate import make_generate_fn

    cfg_r = TINY_T5.replace(remat=True)
    model = LaTr(LaTrConfig(t5=TINY_T5, vit=TINY_VIT))
    model_r = LaTr(LaTrConfig(t5=cfg_r, vit=TINY_VIT))
    batch = _latr_batch(b=2)
    labels = jnp.asarray([[0, 5, 6, 7], [0, 8, 9, 1]], jnp.int32)
    mask = jnp.ones_like(labels)
    params = model.init(jax.random.PRNGKey(0), batch, labels, mask)["params"]

    def loss(m):
        def f(p):
            logits = m.apply({"params": p}, batch, labels, mask)
            return jnp.mean(logits.astype(jnp.float32) ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(model_r))(params)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)

    # decode (cache/step path) still runs under the rematted module
    gen = jax.jit(make_generate_fn(model_r, max_length=5))
    out = np.asarray(gen(params, batch))
    want = np.asarray(jax.jit(make_generate_fn(model, max_length=5))(params, batch))
    np.testing.assert_array_equal(out, want)
