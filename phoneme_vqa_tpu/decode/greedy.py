"""KV-cached greedy autoregressive decoding as one `lax.while_loop`.

Replaces two reference decode regimes with a single on-device loop:
* HF `generate` greedy w/ cache (LaTr/PreSTU/SaL —
  `/root/reference/core/model/LaTr.py:99-110`)
* the Customized/Phoneme models' full-prefix re-decode loops with no cache
  (`/root/reference/core/model/CustomizedLaTr.py:146-184`) — the reference's
  single biggest inference defect.

Semantics mirror HF greedy: the output starts with the decoder-start token,
rows stop emitting after their EOS (padded thereafter), the loop exits early
once every row is done. Shapes are static; per-row early-exit is a done-mask,
so everything jits.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# step_fn(tokens (B,) int32, cache, index scalar) -> (logits (B, V) f32, cache)
StepFn = Callable[[jnp.ndarray, object, jnp.ndarray], Tuple[jnp.ndarray, object]]


def chosen_logprob(logits: jnp.ndarray, chosen: jnp.ndarray) -> jnp.ndarray:
    """log p(chosen) under softmax(logits): (B, V), (B,) -> (B,) f32.

    Shared by every scoring decode path; f32 regardless of compute dtype so
    confidence numbers are stable across bf16/f32 serving configs."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, chosen[:, None].astype(jnp.int32), axis=1)[:, 0]


def greedy_decode(
    step_fn: StepFn,
    cache,
    batch_size: int,
    max_length: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    with_scores: bool = False,
) -> jnp.ndarray:
    """Returns (B, max_length) int32: [bos, t1, ..., eos, pad, ...].

    ``with_scores=True`` additionally returns (B,) f32 mean log-probability
    of the emitted tokens (EOS included) — ``exp`` of it is the geometric
    mean token probability, the serving-confidence number. The accumulator
    is one log-softmax + gather per step, noise next to the step's weight-DMA
    chain (docs/DESIGN.md), so scoring shares this loop instead of a copy.
    """
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
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
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


def multi_head_greedy_decode(
    step_fn,  # (tokens (B, C), cache, i) -> (tuple of C logits (B, V_c), cache)
    cache,
    batch_size: int,
    max_length: int,
    num_components: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    stop_component: int = 0,
    with_scores: bool = False,
) -> jnp.ndarray:
    """Greedy decode over component tuples (phoneme onset/rhyme/tone).

    Each step emits one id per component (argmax of each head independently,
    matching `/root/reference/core/model/PhonemeLaTr.py:198-212`); a row is
    done when its ``stop_component`` (onset) emits EOS.
    Returns (B, max_length, C) int32; ``with_scores=True`` adds (B,) f32
    mean log-prob per emitted component id (a syllable's confidence is the
    product of its C head probabilities, so the mean runs over steps × C).
    """
    out = jnp.full((batch_size, max_length, num_components), pad_id, jnp.int32)
    out = out.at[:, 0, :].set(bos_id)
    done = jnp.zeros((batch_size,), bool)
    sum_lp = jnp.zeros((batch_size,), jnp.float32)
    count = jnp.zeros((batch_size,), jnp.float32)

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_length - 1) & ~jnp.all(done)

    def body(state):
        i, out, cache, done, sum_lp, count = state
        cur = lax.dynamic_slice(out, (0, i, 0), (batch_size, 1, num_components))[:, 0]
        logits_tuple, cache = step_fn(cur, cache, i)
        nxt = jnp.stack(
            [jnp.argmax(l, axis=-1).astype(jnp.int32) for l in logits_tuple], axis=-1
        )
        if with_scores:
            lp = sum(
                chosen_logprob(l, nxt[:, c])
                for c, l in enumerate(logits_tuple)
            )
            sum_lp = sum_lp + jnp.where(done, 0.0, lp)
            count = count + (~done).astype(jnp.float32) * len(logits_tuple)
        nxt = jnp.where(done[:, None], pad_id, nxt)
        out = lax.dynamic_update_slice(out, nxt[:, None], (0, i + 1, 0))
        done = done | (nxt[:, stop_component] == eos_id)
        return i + 1, out, cache, done, sum_lp, count

    _, out, _, _, sum_lp, count = lax.while_loop(
        cond, body, (jnp.int32(0), out, cache, done, sum_lp, count)
    )
    if with_scores:
        return out, sum_lp / jnp.maximum(count, 1.0)
    return out
