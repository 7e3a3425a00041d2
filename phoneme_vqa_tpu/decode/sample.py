"""Stochastic decoding (temperature / top-k / top-p) as one `lax.while_loop`.

The reference decodes greedy-only (beam is commented out/buggy there —
`/root/reference/core/model/LaTr.py:99-110`); production serving also wants
sampled generations (diverse answers, self-consistency voting). Same
device-resident loop shape as `greedy.greedy_decode`: explicit functional KV
cache, per-row done-latch, all-done early exit, static shapes. The filters
compose the standard way: temperature scales logits, top-k keeps the k best,
top-p (nucleus) keeps the smallest probability-mass prefix >= p; sampling is
`jax.random.categorical` on the filtered logits, deterministic per (seed,
step, row) via fold_in.

temperature=0 (or top_k=1) short-circuits to argmax — bitwise the greedy
path's choice on the same logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .greedy import StepFn

NEG = jnp.float32(-1e9)


def filter_logits(
    logits: jnp.ndarray,  # (B, V) f32
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Apply temperature, then top-k, then nucleus top-p masking."""
    if temperature not in (0.0, 1.0):
        logits = logits / jnp.float32(temperature)
    v = logits.shape[-1]
    if top_k and 0 < top_k < v:
        kth = jnp.sort(logits, axis=-1)[:, v - top_k][:, None]
        logits = jnp.where(logits < kth, NEG, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # desc
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the mass BEFORE them is < p (always >= 1 token)
        keep_sorted = (cum - probs) < top_p
        # threshold = smallest kept logit
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1
        )[:, None]
        logits = jnp.where(logits < thresh, NEG, logits)
    return logits


def sample_decode(
    step_fn: StepFn,
    cache,
    batch_size: int,
    max_length: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    seed: int = 0,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: Optional[jax.Array] = None,
    with_scores: bool = False,
) -> jnp.ndarray:
    """Returns (B, max_length) int32 sampled ids, greedy-shaped output.

    ``temperature == 0`` or ``top_k == 1`` degenerate to argmax (greedy).
    ``with_scores=True`` adds (B,) f32 mean log-prob of the emitted tokens
    under the RAW model distribution (pre temperature/filtering) — the
    model's actual confidence in what sampling picked, not the skewed
    sampling distribution's.
    """
    from .greedy import chosen_logprob

    base_rng = jax.random.PRNGKey(seed) if rng is None else rng
    greedy_mode = temperature == 0.0 or top_k == 1

    out = jnp.full((batch_size, max_length), pad_id, jnp.int32)
    out = out.at[:, 0].set(bos_id)
    done = jnp.zeros((batch_size,), bool)
    sum_lp = jnp.zeros((batch_size,), jnp.float32)
    count = jnp.zeros((batch_size,), jnp.float32)

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_length - 1) & ~jnp.all(done)

    def body(state):
        i, out, cache, done, sum_lp, count = state
        cur = lax.dynamic_slice(out, (0, i), (batch_size, 1))[:, 0]
        logits, cache = step_fn(cur, cache, i)
        if greedy_mode:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            filtered = filter_logits(
                logits.astype(jnp.float32), temperature, top_k, top_p
            )
            nxt = jax.random.categorical(
                jax.random.fold_in(base_rng, i), filtered, axis=-1
            ).astype(jnp.int32)
        if with_scores:
            lp = chosen_logprob(logits, nxt)
            sum_lp = sum_lp + jnp.where(done, 0.0, lp)
            count = count + (~done).astype(jnp.float32)
        nxt = jnp.where(done, pad_id, nxt)
        out = lax.dynamic_update_slice(out, nxt[:, None], (0, i + 1))
        done = done | (nxt == eos_id)
        return i + 1, out, cache, done, sum_lp, count

    _, out, _, _, sum_lp, count = lax.while_loop(
        cond, body, (jnp.int32(0), out, cache, done, sum_lp, count)
    )
    if with_scores:
        return out, sum_lp / jnp.maximum(count, 1.0)
    return out
