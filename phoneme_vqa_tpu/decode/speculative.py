"""Speculative greedy decoding with prompt-lookup drafts, as ONE while_loop.

Scene-text VQA answers overwhelmingly copy spans of the OCR input (that is
the task — `/root/reference/core/data/utils.py` builds answers from OCR
tokens). The decode loop is latency-bound, not FLOP-bound (docs/DESIGN.md:
each step is a weight-DMA chain; its matmuls are tiny), so verifying K
tokens per step costs nearly the same wall time as verifying one. This
module drafts K-1 continuation tokens by n-gram lookup in each row's source
ids (OCR ++ question — "prompt lookup decoding", no draft model), verifies
the whole window in one `decode_step_k`, and accepts the longest matching
prefix. Exactness invariant: output is token-for-token IDENTICAL to plain
greedy for ANY draft function — drafts only change how many loop trips the
same answer takes. Rows advance at their own per-row rate (no min-over-batch
barrier); everything stays static-shape inside one `lax.while_loop`.

The reference has no counterpart (its decode re-runs the full prefix per
token); this is a beyond-reference serving feature, opt-in via
``SPEC_DECODE: K``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# step_k_fn(tokens (B, K) int32, cache, pos (B,) int32)
#   -> (logits (B, K, V) f32, cache)
StepKFn = Callable[[jnp.ndarray, object, jnp.ndarray], Tuple[jnp.ndarray, object]]
# draft_fn(out (B, T) int32, pos (B,) int32) -> (B, K-1) int32
DraftFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def draft_from_pair(
    src: jnp.ndarray,        # (B, Ls) int32 source corpus
    valid: jnp.ndarray,      # (B, Ls) bool — 1 = real token
    cur: jnp.ndarray,        # (B,) current (last verified) token
    prev: jnp.ndarray,       # (B,) token before it
    have_prev: jnp.ndarray,  # (B,) bool — prev is meaningful (pos > 0)
    num_draft: int,
    pad_id: int,
) -> jnp.ndarray:
    """Draft the `num_draft` tokens that FOLLOW the source's first occurrence
    of the current n-gram: bigram (prev, cur) match when one exists, else
    unigram (cur). No match -> pad drafts (they verify-fail harmlessly).

    This is the draft core shared by the offline speculative loop (which
    reads cur/prev from its output buffer) and the continuous serving
    engine's per-slot speculative step (which carries cur/prev in slot
    state, since its slots have no output buffer on device)."""
    ls = src.shape[1]
    m1 = (src == cur[:, None]) & valid
    src_prev = jnp.pad(src[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    m2 = m1 & (src_prev == prev[:, None]) & have_prev[:, None]
    use2 = jnp.any(m2, axis=1)
    m = jnp.where(use2[:, None], m2, m1)
    has = jnp.any(m, axis=1)
    first = jnp.argmax(m, axis=1)  # first match position
    cont_pos = first[:, None] + 1 + jnp.arange(num_draft)[None, :]
    cont = jnp.take_along_axis(src, jnp.minimum(cont_pos, ls - 1), axis=1)
    ok = has[:, None] & (cont_pos < ls)
    ok = ok & jnp.take_along_axis(
        valid, jnp.minimum(cont_pos, ls - 1), axis=1
    )
    return jnp.where(ok, cont, pad_id).astype(jnp.int32)


def make_prompt_lookup_draft(
    source_ids: jnp.ndarray,  # (B, Ls) int32 — e.g. tokenized_ocr ++ question
    num_draft: int,
    pad_id: int,
    source_mask: jnp.ndarray = None,  # (B, Ls) 1 = real token
) -> DraftFn:
    """`draft_from_pair` reading (prev, cur) from the decode output buffer."""
    src = source_ids.astype(jnp.int32)
    b, ls = src.shape
    valid = (
        jnp.ones((b, ls), bool) if source_mask is None
        else source_mask.astype(bool)
    )

    def draft(out: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        cur = jnp.take_along_axis(out, pos[:, None], axis=1)[:, 0]  # (B,)
        prev_pos = jnp.maximum(pos - 1, 0)
        prev = jnp.take_along_axis(out, prev_pos[:, None], axis=1)[:, 0]
        return draft_from_pair(
            src, valid, cur, prev, pos > 0, num_draft, pad_id
        )

    return draft


def speculative_greedy_decode(
    step_k_fn: StepKFn,
    draft_fn: DraftFn,
    cache,
    batch_size: int,
    max_length: int,
    spec_k: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    with_scores: bool = False,
) -> jnp.ndarray:
    """Returns (B, max_length) int32, IDENTICAL to `greedy_decode`'s output.
    ``with_scores=True`` adds (B,) f32 mean emitted-token log-prob, equal to
    plain greedy's (verification computes every emitted position's logits,
    so confidence costs no extra steps — accepted drafts score for free).

    Loop state is (pos, out, cache, done) where pos[b] is the position of
    row b's last verified input token. Each trip: draft K-1 tokens, verify
    the window [cur, drafts] in one step_k, accept the longest prefix where
    draft == greedy, emit 1..K tokens. Window K/V beyond a row's accepted
    count land in cache slots >= the row's next pos — never read (the
    attention mask is strictly-before-window) and overwritten by the next
    trip's window, so rejected drafts cannot corrupt later steps."""
    kk = spec_k
    out = jnp.full((batch_size, max_length), pad_id, jnp.int32)
    out = out.at[:, 0].set(bos_id)
    pos = jnp.zeros((batch_size,), jnp.int32)
    done = jnp.zeros((batch_size,), bool)
    sum_lp = jnp.zeros((batch_size,), jnp.float32)
    count = jnp.zeros((batch_size,), jnp.float32)
    jj = jnp.arange(kk, dtype=jnp.int32)[None, :]  # (1, K)

    def cond(state):
        _, _, _, done, _, _ = state
        return ~jnp.all(done)

    def body(state):
        pos, out, cache, done, sum_lp, count = state
        cur = jnp.take_along_axis(out, pos[:, None], axis=1)  # (B, 1)
        drafts = draft_fn(out, pos)  # (B, K-1)
        window = jnp.concatenate([cur, drafts], axis=1)  # (B, K)
        logits, cache = step_k_fn(window, cache, pos)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)

        # longest accepted prefix: greedy[j] is the token at out position
        # pos+j+1; draft j (= window[:, j+1]) is accepted iff it equals
        # greedy[j] AND every earlier draft matched
        match = (window[:, 1:] == greedy[:, :-1]).astype(jnp.int32)  # (B,K-1)
        n_acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,) 1..K
        space = (max_length - 1) - pos  # tokens writable after pos
        n_acc = jnp.minimum(n_acc, space)

        toks = jnp.where(jj < n_acc[:, None], greedy, pad_id)
        # cut after the first EOS within the accepted run (EOS itself kept)
        is_eos = (toks == eos_id).astype(jnp.int32)
        eos_before = jnp.cumsum(is_eos, axis=1) - is_eos
        keep = (jj < n_acc[:, None]) & (eos_before == 0) & ~done[:, None]
        toks = jnp.where(keep, toks, pad_id)
        n_eff = jnp.sum(keep.astype(jnp.int32), axis=1)  # (B,)
        if with_scores:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(logp, greedy[:, :, None], axis=2)[
                :, :, 0
            ]  # (B, K)
            sum_lp = sum_lp + jnp.sum(jnp.where(keep, tok_lp, 0.0), axis=1)
            count = count + n_eff.astype(jnp.float32)

        # scatter toks into out at positions pos+1+j (one-hot over T: T and
        # K are small; collisions past max_length-1 are masked by `keep`)
        write_pos = pos[:, None] + 1 + jj  # (B, K)
        tgrid = jax.lax.broadcasted_iota(jnp.int32, (1, max_length, 1), 1)
        hit = (tgrid == write_pos[:, None, :]) & keep[:, None, :]  # (B,T,K)
        written = jnp.sum(
            jnp.where(hit, toks[:, None, :], 0), axis=2
        )  # (B, T)
        out = jnp.where(jnp.any(hit, axis=2), written, out)

        # a not-done row always accepts >= 1 token (space >= 1 until done is
        # set), so done rows are exactly the rows with n_eff == 0
        done = (
            done
            | jnp.any(keep & (toks == eos_id), axis=1)
            | (pos + n_eff >= max_length - 1)
        )
        pos = pos + n_eff
        return pos, out, cache, done, sum_lp, count

    _, out, _, _, sum_lp, count = lax.while_loop(
        cond, body, (pos, out, cache, done, sum_lp, count)
    )
    if with_scores:
        return out, sum_lp / jnp.maximum(count, 1.0)
    return out
