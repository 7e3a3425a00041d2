"""Base-scale (12-layer / 768-wide / 36k-vocab) weight-import + answer parity
— the BASELINE.json north-star gate at the REAL model size (VERDICT r1
item 1; previously proven only at d_model=32).

A full-size random-init HF torch T5 is constructible offline (no weights are
downloadable here); `import_t5_params` must map every tensor (strict mode),
and our jitted KV-cached while_loop greedy must reproduce HF `generate`
token-for-token in f32. bf16 (the TPU serving dtype) is measured: at random
init the top-2 logit gap over a 36k vocab is tiny, so bf16 rounding CAN flip
early tokens and diverge — the test reports the exact-answer match rate and
gates only that decode runs and the first step stays stable in aggregate.
Reference path being matched: /root/reference/core/model/LaTr.py:99-110.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.greedy import greedy_decode
from phoneme_vqa_tpu.models.hf_import import ImportReport, import_t5_params
from phoneme_vqa_tpu.models.t5 import T5, T5Config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

VOCAB = 36096
D_MODEL, D_KV, HEADS, D_FF, LAYERS = 768, 64, 12, 3072, 12
EOS, PAD = 1, 0


@pytest.fixture(scope="module")
def base_scale():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=D_MODEL, d_kv=D_KV, num_heads=HEADS,
        d_ff=D_FF, num_layers=LAYERS, num_decoder_layers=LAYERS,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        tie_word_embeddings=True, decoder_start_token_id=0,
        pad_token_id=PAD, eos_token_id=EOS,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(
        vocab_size=VOCAB, d_model=D_MODEL, d_kv=D_KV, num_heads=HEADS,
        d_ff=D_FF, num_layers=LAYERS, num_decoder_layers=LAYERS,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    model = T5(cfg)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, D_MODEL)),
        jnp.zeros((1, 2), jnp.int32),
    )["params"]
    # materialize host-side (cheap) — every leaf is then overwritten by import
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    report = ImportReport()
    params = import_t5_params(
        params, {k: v.numpy() for k, v in hf.state_dict().items()},
        strict=True, report=report,
    )
    report.log_summary("T5-base")
    assert not report.failed and not report.unused
    assert len(report.mapped) >= 12 * 10 * 2  # every block tensor mapped

    b, l_enc = 4, 327  # ViT 197 + OCR 100 + question 30: the LaTr fused length
    rng = np.random.RandomState(1)
    embeds = (rng.randn(b, l_enc, D_MODEL) * 0.7).astype(np.float32)
    enc_mask = np.ones((b, l_enc), np.int64)
    enc_mask[2, 250:] = 0
    enc_mask[3, 100:] = 0
    return hf, model, params, embeds, enc_mask


def _our_greedy(model, params, embeds, enc_mask, max_len, dtype):
    p = (
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        if dtype == jnp.bfloat16
        else params
    )
    emb = jnp.asarray(embeds, dtype)
    mask = jnp.asarray(enc_mask)

    @jax.jit
    def run(p, emb, mask):
        enc_out = model.apply({"params": p}, emb, mask, method=T5.encode)
        cache, full_bias = model.apply(
            {"params": p}, enc_out, max_len, method=T5.init_cache
        )

        def step(tokens, cache, i):
            return model.apply(
                {"params": p}, tokens, cache, i, full_bias, mask,
                method=T5.decode_step,
            )

        return greedy_decode(step, cache, emb.shape[0], max_len, 0, EOS, PAD)

    return np.asarray(run(p, emb, mask))


def test_base_scale_greedy_answer_parity_f32(base_scale):
    """Token-for-token equality with HF generate at vit5-base scale (f32)."""
    hf, model, params, embeds, enc_mask, = base_scale
    max_len = 12
    with torch.no_grad():
        want = hf.generate(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(enc_mask),
            max_length=max_len, do_sample=False, num_beams=1,
        ).numpy()
    ours = _our_greedy(model, params, embeds, enc_mask, max_len, jnp.float32)
    t_hf = want.shape[1]
    np.testing.assert_array_equal(ours[:, :t_hf], want)


def test_base_scale_bf16_match_rate(base_scale):
    """bf16 serving dtype: measure (and report) the exact-answer match rate
    vs the f32 decode. Random-init logit gaps over a 36k vocab are razor thin
    (worst case for bf16), so this is a floor, not the trained-weights rate."""
    _, model, params, embeds, enc_mask = base_scale
    max_len = 12
    f32 = _our_greedy(model, params, embeds, enc_mask, max_len, jnp.float32)
    bf16 = _our_greedy(model, params, embeds, enc_mask, max_len, jnp.bfloat16)
    b = f32.shape[0]
    row_match = sum(bool(np.array_equal(f32[i], bf16[i])) for i in range(b))
    tok_match = float((f32 == bf16).mean())
    print(
        f"\nbf16 vs f32 at base scale: exact-answer {row_match}/{b}, "
        f"token-level {tok_match:.3f}"
    )
    assert bf16.shape == f32.shape
    assert (bf16[:, 0] == 0).all()  # decoder-start token intact
    # aggregate stability: most tokens agree even at random init
    assert tok_match >= 0.5, f"bf16 token match rate collapsed: {tok_match}"


def test_base_scale_vit_import_parity():
    """ViT-base (224px / 12-layer / 768-wide) import: forward parity."""
    from transformers import ViTConfig as HFViTConfig, ViTModel

    from phoneme_vqa_tpu.models.hf_import import import_vit_params
    from phoneme_vqa_tpu.models.vit import ViT, ViTConfig

    torch.manual_seed(2)
    hf = ViTModel(HFViTConfig(), add_pooling_layer=False).eval()
    cfg = ViTConfig(
        image_size=224, patch_size=16, hidden_size=768, num_layers=12,
        num_heads=12, mlp_dim=3072, dtype=jnp.float32,
    )
    model = ViT(cfg)
    pix = np.random.RandomState(3).randn(2, 3, 224, 224).astype(np.float32)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(pix)
    )["params"]
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    report = ImportReport()
    params = import_vit_params(
        params, {k: v.numpy() for k, v in hf.state_dict().items()},
        strict=True, report=report,
    )
    assert not report.failed
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(pix)).last_hidden_state.numpy()
    got = np.asarray(jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.asarray(pix)
    ))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
