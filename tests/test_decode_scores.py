"""Decode confidence scores (`with_scores=True` across every decode path).

The score contract: mean log-probability of the emitted tokens (EOS
included, post-EOS padding excluded), f32, identical in meaning across
greedy / sampling / speculative / beam so serving can threshold on one
number regardless of the configured decode. The reference has no
counterpart (its decode returns ids only); this is serving surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.beam import _expand_to_beams, beam_decode
from phoneme_vqa_tpu.decode.greedy import (
    greedy_decode,
    multi_head_greedy_decode,
)
from phoneme_vqa_tpu.decode.sample import sample_decode
from phoneme_vqa_tpu.decode.speculative import (
    make_prompt_lookup_draft,
    speculative_greedy_decode,
)
from phoneme_vqa_tpu.models.t5 import T5, T5Config

V, B, MAX_LEN, EOS = 11, 2, 6, 1


def _table_step(table):
    """step_fn emitting fixed logits table[i] (B, V) at step i; cache is a
    dummy counter so the loop state stays a valid jax type."""

    def step(tokens, cache, i):
        return jnp.take(table, i, axis=0), cache + 1

    return step


def _manual_mean_logprob(table, ids):
    """Expected score computed independently in numpy: mean log-softmax of
    the chosen token over emitted positions (stop after EOS, inclusive)."""
    out = []
    for b in range(ids.shape[0]):
        lps = []
        for i in range(ids.shape[1] - 1):
            tok = ids[b, i + 1]
            row = np.asarray(table[i, b], np.float64)
            lp = row - (np.log(np.sum(np.exp(row - row.max()))) + row.max())
            lps.append(lp[tok])
            if tok == EOS:
                break
        out.append(np.mean(lps))
    return np.array(out)


@pytest.fixture(scope="module")
def table():
    rng = np.random.RandomState(7)
    t = rng.randn(MAX_LEN, B, V).astype(np.float32) * 3
    # row 0 hits EOS at step 2; row 1 never does (runs to max_length)
    t[2, 0, EOS] = 50.0
    t[:, 1, EOS] = -50.0
    return jnp.asarray(t)


def test_greedy_scores_match_manual(table):
    step = _table_step(table)
    ids_plain = greedy_decode(step, jnp.int32(0), B, MAX_LEN, 0, EOS, 0)
    ids, scores = greedy_decode(
        step, jnp.int32(0), B, MAX_LEN, 0, EOS, 0, with_scores=True
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_plain))
    want = _manual_mean_logprob(np.asarray(table), np.asarray(ids))
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)
    assert (np.asarray(scores) <= 1e-6).all()  # log-probs


def test_sample_scores_raw_distribution(table):
    """Sampled tokens score under the RAW distribution even when temperature
    and top-k reshape the sampling one."""
    step = _table_step(table)
    ids, scores = sample_decode(
        step, jnp.int32(0), B, MAX_LEN, 0, EOS, 0,
        seed=3, temperature=1.7, top_k=5, with_scores=True,
    )
    want = _manual_mean_logprob(np.asarray(table), np.asarray(ids))
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)


def test_sample_greedy_mode_scores_equal_greedy(table):
    step = _table_step(table)
    _, want = greedy_decode(
        step, jnp.int32(0), B, MAX_LEN, 0, EOS, 0, with_scores=True
    )
    _, got = sample_decode(
        step, jnp.int32(0), B, MAX_LEN, 0, EOS, 0,
        temperature=0.0, with_scores=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_multi_head_scores(table):
    """Component heads sum per step; mean runs over steps x C."""
    C = 3
    tables = [table, jnp.roll(table, 1, axis=-1), jnp.roll(table, 2, axis=-1)]

    def step(tokens, cache, i):
        return tuple(jnp.take(t, i, axis=0) for t in tables), cache + 1

    ids, scores = multi_head_greedy_decode(
        step, jnp.int32(0), B, MAX_LEN, C, 0, EOS, 0, with_scores=True
    )
    ids = np.asarray(ids)
    want = np.zeros(B)
    for b in range(B):
        lps = []
        for i in range(MAX_LEN - 1):
            for c, t in enumerate(tables):
                row = np.asarray(t[i, b], np.float64)
                lp = row - (np.log(np.sum(np.exp(row - row.max()))) + row.max())
                lps.append(lp[ids[b, i + 1, c]])
            if ids[b, i + 1, 0] == EOS:
                break
        want[b] = np.mean(lps)
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)


def test_beam_scores_count_mid_sequence_pad(table):
    """A beam can emit pad_id mid-sequence from degenerate logits; that pad
    was SCORED into the cumulative sum, so it must count toward the mean's
    denominator (tracked in-loop, not inferred from `!= pad_id` post hoc)."""
    t = np.full((MAX_LEN, 1, V), -5.0, np.float32)
    t[0, 0, 0] = 5.0  # step 0: argmax is pad_id (0) — does NOT finish
    t[1, 0, EOS] = 5.0  # step 1: EOS finishes the beam
    t = jnp.asarray(t)

    def step(tokens, cache, i):  # beam caches: dicts of batch-major leaves
        return jnp.take(t, i, axis=0), {"n": cache["n"] + 1}

    ids, scores = beam_decode(
        step, {"n": jnp.zeros((1,), jnp.int32)}, 1, 1, MAX_LEN, 0, EOS, 0,
        with_scores=True,
    )
    ids = np.asarray(ids)
    np.testing.assert_array_equal(ids[0, 1:3], [0, EOS])

    def lp(i, tok):
        row = np.asarray(t[i, 0], np.float64)
        return row[tok] - (np.log(np.sum(np.exp(row - row.max()))) + row.max())

    want = (lp(0, 0) + lp(1, EOS)) / 2.0  # two scored emissions, pad included
    np.testing.assert_allclose(np.asarray(scores)[0], want, rtol=1e-5, atol=1e-6)
    # the old post-hoc `!= pad_id` count would have divided by 1, not 2
    assert abs(np.asarray(scores)[0] - 2 * want) > 1e-7 or abs(want) < 1e-12


# -- real-model paths: speculative and beam agree with greedy -----------------

TINY = T5Config(
    vocab_size=37, d_model=32, d_kv=8, num_heads=4, d_ff=64,
    num_layers=2, num_decoder_layers=2, dropout_rate=0.0, dtype=jnp.float32,
)
TB, L_ENC, TMAX, SPEC_K = 3, 9, 10, 4


@pytest.fixture(scope="module")
def t5_setup():
    model = T5(TINY)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (TB, L_ENC, TINY.d_model))
    enc_mask = jnp.ones((TB, L_ENC), jnp.int32)
    dec = jnp.zeros((TB, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, dec, enc_mask)["params"]
    enc = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)
    return model, params, enc, enc_mask


def _greedy_scored(model, params, enc, enc_mask):
    cache, bias = model.apply(
        {"params": params}, enc, TMAX, method=T5.init_cache
    )

    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, bias, enc_mask,
            method=T5.decode_step,
        )

    return greedy_decode(
        step, cache, TB, TMAX, 0, TINY.eos_token_id, 0, with_scores=True
    )


def test_speculative_scores_match_greedy(t5_setup):
    """Spec decode's score is exactly greedy's: verification computes every
    emitted position's logits, accepted drafts included."""
    model, params, enc, enc_mask = t5_setup
    ref_ids, ref_scores = _greedy_scored(model, params, enc, enc_mask)

    cache, bias = model.apply(
        {"params": params}, enc, TMAX, method=T5.init_cache
    )

    def step_k(tokens, cache, pos):
        return model.apply(
            {"params": params}, tokens, cache, pos, bias, enc_mask,
            method=T5.decode_step_k,
        )

    # oracle draft: copy the greedy answer (maximal acceptance — the path
    # where score accounting over multi-token windows must still be exact)
    draft = make_prompt_lookup_draft(
        jnp.asarray(ref_ids), SPEC_K - 1, 0
    )
    ids, scores = speculative_greedy_decode(
        step_k, draft, cache, TB, TMAX, SPEC_K, 0, TINY.eos_token_id, 0,
        with_scores=True,
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=2e-4
    )


def test_beam_k1_scores_match_greedy(t5_setup):
    """K=1 beam is greedy; its normalized winning score must match greedy's
    mean emitted-token log-prob."""
    model, params, enc, enc_mask = t5_setup
    _, ref_scores = _greedy_scored(model, params, enc, enc_mask)

    cache, bias = model.apply(
        {"params": params}, enc, TMAX, method=T5.init_cache
    )
    cache = _expand_to_beams(cache, 1)
    enc_mask_k = _expand_to_beams(enc_mask, 1)

    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, bias, enc_mask_k,
            method=T5.decode_step,
        )

    _, scores = beam_decode(
        step, cache, TB, 1, TMAX, 0, TINY.eos_token_id, 0, with_scores=True
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=2e-4
    )
