"""Sampling decode: filter semantics, greedy degeneration, determinism.

`decode/sample.py` adds temperature / top-k / nucleus sampling over the same
compiled whole-sequence loop as greedy (reference has greedy only). Pins:

* temperature=0 and top_k=1 are bitwise the greedy output
* filter_logits: top-k keeps exactly k, top-p keeps the smallest prefix
  with mass >= p, always >= 1 token
* sampled ids are deterministic per seed, vary across seeds, respect the
  support of the filtered distribution
* executor-level SAMPLE knob builds and runs through infer
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.greedy import greedy_decode
from phoneme_vqa_tpu.decode.sample import filter_logits, sample_decode
from phoneme_vqa_tpu.models.t5 import T5, T5Config

TINY = T5Config(
    vocab_size=41, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_layers=2, num_decoder_layers=2, dropout_rate=0.0, dtype=jnp.float32,
)
B, L_ENC, MAX_LEN = 2, 7, 9


@pytest.fixture(scope="module")
def setup():
    model = T5(TINY)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, L_ENC, TINY.d_model))
    enc_mask = jnp.ones((B, L_ENC), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), embeds, jnp.zeros((B, 2), jnp.int32), enc_mask
    )["params"]
    enc = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)

    def mk_cache():
        return model.apply({"params": params}, enc, MAX_LEN, method=T5.init_cache)

    def mk_step(bias):
        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, bias, enc_mask,
                method=T5.decode_step,
            )
        return step

    return mk_cache, mk_step


def _decode(setup, **kw):
    mk_cache, mk_step = setup
    cache, bias = mk_cache()
    return np.asarray(
        sample_decode(
            mk_step(bias), cache, B, MAX_LEN, 0, TINY.eos_token_id, 0, **kw
        )
    )


def test_zero_temperature_is_greedy(setup):
    mk_cache, mk_step = setup
    cache, bias = mk_cache()
    ref = np.asarray(
        greedy_decode(mk_step(bias), cache, B, MAX_LEN, 0, TINY.eos_token_id, 0)
    )
    np.testing.assert_array_equal(ref, _decode(setup, temperature=0.0))
    np.testing.assert_array_equal(ref, _decode(setup, top_k=1, temperature=0.7))


def test_seed_determinism_and_variation(setup):
    a = _decode(setup, seed=7, temperature=1.0)
    b = _decode(setup, seed=7, temperature=1.0)
    c = _decode(setup, seed=8, temperature=1.0)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # 41-vocab random logits: ~certain


def test_filter_logits_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(filter_logits(logits, top_k=2))
    kept = out > -1e8
    np.testing.assert_array_equal(kept[0], [False, True, False, False, True])


def test_filter_logits_top_p():
    # probs ~ [0.643, 0.237, 0.087, 0.032] after softmax of [3, 2, 1, 0]
    logits = jnp.log(jnp.asarray([[0.643, 0.237, 0.087, 0.032]]))
    kept = np.asarray(filter_logits(logits, top_p=0.7)) > -1e8
    np.testing.assert_array_equal(kept[0], [True, True, False, False])
    # p smaller than the top prob still keeps >= 1 token
    kept1 = np.asarray(filter_logits(logits, top_p=0.1)) > -1e8
    np.testing.assert_array_equal(kept1[0], [True, False, False, False])


def test_sampled_tokens_respect_topk_support(setup):
    """With top_k=3 every sampled (non-pad, non-forced) token must be one of
    that step's 3 best — checked by re-running the filter offline."""
    mk_cache, mk_step = setup
    cache, bias = mk_cache()
    step = mk_step(bias)
    ids = _decode(setup, seed=3, top_k=3, temperature=1.3)
    cache2, _ = mk_cache()
    toks = jnp.asarray(ids[:, 0])
    for i in range(MAX_LEN - 1):
        logits, cache2 = step(toks, cache2, jnp.int32(i))
        allowed = np.asarray(
            filter_logits(jnp.asarray(logits), 1.3, 3, 1.0) > -1e8
        )
        nxt = ids[:, i + 1]
        for b in range(B):
            if nxt[b] != 0:  # pad after done
                assert allowed[b, nxt[b]], (i, b, nxt[b])
        toks = jnp.asarray(nxt)


@pytest.mark.slow
def test_executor_sample_knob(tmp_path):
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        SAMPLE=True, TEMPERATURE=0.8, TOP_P=0.9,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    preds = ex.infer(ex.val_data, 4, 8)
    assert len(preds) == len(ex.val_data)
    assert all(isinstance(p, str) for p in preds)

    # repeated calls on the SAME input draw different noise (a per-call
    # counter is folded into the key) — without it every infer call / server
    # run would return identical "samples", defeating diverse answers and
    # self-consistency voting. Raw ids, not strings: near-uniform random-init
    # logits make an id-level collision across two (4, 8) draws negligible.
    from phoneme_vqa_tpu.data.loader import batch_iterator

    gen = ex._get_generate_fn(8)
    params = ex._inference_params()
    batch, _ = next(batch_iterator(ex.val_data, 4, pad_final=True))
    model_batch = ex._shard(ex._model_batch(batch))
    a = np.asarray(gen(params, model_batch))
    b = np.asarray(gen(params, model_batch))
    assert not np.array_equal(a, b), "two sampling calls drew identical noise"
