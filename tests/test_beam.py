"""Beam search correctness: K=1 == greedy; K>1 never scores worse."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from phoneme_vqa_tpu.decode.beam import _expand_to_beams, beam_decode
from phoneme_vqa_tpu.decode.greedy import greedy_decode
from phoneme_vqa_tpu.models.t5 import T5, T5Config

CFG = T5Config(
    vocab_size=29, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_layers=1, num_decoder_layers=2, dropout_rate=0.0, dtype=jnp.float32,
)


def _setup():
    model = T5(CFG)
    b, l_enc = 3, 5
    embeds = jax.random.normal(jax.random.PRNGKey(3), (b, l_enc, CFG.d_model))
    enc_mask = jnp.ones((b, l_enc), jnp.int32)
    dec_ids = jnp.zeros((b, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(4), embeds, dec_ids, enc_mask)["params"]
    enc_out = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)
    return model, params, enc_out, enc_mask, b


def _make_step(model, params, full_bias, enc_mask):
    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, full_bias, enc_mask,
            method=T5.decode_step,
        )

    return step


def _seq_logprob(model, params, seq, enc_out, enc_mask, eos, pad):
    """Log prob of [bos, t1, ..., eos] under teacher forcing."""
    logits = model.apply(
        {"params": params}, seq[None, :-1], enc_out, enc_mask, None, method=T5.decode
    )
    logp = jax.nn.log_softmax(logits[0], -1)
    total, done = 0.0, False
    for t in range(seq.shape[0] - 1):
        tok = int(seq[t + 1])
        if done:
            break
        total += float(logp[t, tok])
        if tok == eos:
            done = True
    return total


def test_beam1_equals_greedy():
    model, params, enc_out, enc_mask, b = _setup()
    max_len = 7
    cache, full_bias = model.apply({"params": params}, enc_out, max_len, method=T5.init_cache)
    step = _make_step(model, params, full_bias, enc_mask)
    greedy = greedy_decode(step, cache, b, max_len, 0, CFG.eos_token_id, 0)

    cache1 = _expand_to_beams(
        model.apply({"params": params}, enc_out, max_len, method=T5.init_cache)[0], 1
    )
    beam1 = beam_decode(step, cache1, b, 1, max_len, 0, CFG.eos_token_id, 0)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


@pytest.mark.slow
def test_beam_e2e_executors(tmp_path):
    """isgreedy=False / num_beam routes through beam for both the customized
    single-stream and the phoneme triple-stream executors."""
    import json
    import os

    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import ANSWERS, QUESTIONS, make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths,
        str(tmp_path / "ck"),
        EXECUTOR="CustomizedLaTr_Executor",
        MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer",
        num_decoder_layers=2,
        n_head=4,
        max_a_length=12,
        isgreedy=False,
        num_beam=2,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    preds = ex.infer(ex.val_data, 8, 6)
    assert len(preds) == 6 and all(isinstance(p, str) for p in preds)

    ann = {"annotations": [{"question": q, "answers": [a]}
                           for q, a in zip(QUESTIONS, ANSWERS)]}
    ann_path = os.path.join(str(tmp_path), "ann.json")
    json.dump(ann, open(ann_path, "w", encoding="utf-8"), ensure_ascii=False)
    yaml_path = tiny_latr_yaml(
        paths,
        str(tmp_path / "ck2"),
        EXECUTOR="PhonemeLaTr_Executor",
        MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "pv.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2,
        n_head=4,
        max_a_length=12,
        isgreedy=False,
        num_beam=2,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    preds = ex.infer(ex.val_data, 8, 6)
    assert len(preds) == 6 and all(isinstance(p, str) for p in preds)


def test_beam_scores_at_least_greedy():
    model, params, enc_out, enc_mask, b = _setup()
    max_len = 7
    k = 4
    cache, full_bias = model.apply({"params": params}, enc_out, max_len, method=T5.init_cache)
    step_g = _make_step(model, params, full_bias, enc_mask)
    greedy = np.asarray(greedy_decode(step_g, cache, b, max_len, 0, CFG.eos_token_id, 0))

    cache_k = _expand_to_beams(
        model.apply({"params": params}, enc_out, max_len, method=T5.init_cache)[0], k
    )
    enc_mask_k = _expand_to_beams(enc_mask, k)
    step_b = _make_step(model, params, full_bias, enc_mask_k)
    beam = np.asarray(
        beam_decode(step_b, cache_k, b, k, max_len, 0, CFG.eos_token_id, 0)
    )

    for row in range(b):
        g = _seq_logprob(model, params, jnp.asarray(greedy[row]), enc_out[row : row + 1],
                         enc_mask[row : row + 1], CFG.eos_token_id, 0)
        bm = _seq_logprob(model, params, jnp.asarray(beam[row]), enc_out[row : row + 1],
                          enc_mask[row : row + 1], CFG.eos_token_id, 0)
        assert bm >= g - 1e-4, (row, bm, g)
