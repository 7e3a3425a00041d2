"""Slot-refill greedy decoding over a device-resident POOL of prefilled rows.

Offline eval/predict decode (`executor.infer`) batches B rows and runs
`greedy_decode`'s while_loop until ALL rows in the batch finish: with
variable-length answers every batch pays max-over-batch steps while
mean-length is what matters (for lengths ~ U[3,20] at B=16 that is
E[max]≈18.4 vs E[len]≈11.5 — ~1.6x the decode steps the tokens need). The
continuous serving engine already solved exactly this with slot refill
(`serving/continuous.py`); this module brings the same occupancy win to the
offline path — but TPU-native for the offline shape: the whole dataset chunk
is ONE compiled `lax.while_loop` (one dispatch, ~28 ms saved per batch in
this environment), because unlike serving, offline decode knows every row up
front:

* All N rows are prefilled (the same per-batch ``encode_for_generate`` calls
  batch-greedy runs) and their caches stay device-resident as a POOL.
* S decode slots run `decode_step_k` with K=1 at per-row positions (the
  continuous engine's primitive). When a slot's row emits EOS the slot
  refills from the pool INSIDE the loop — a `lax.cond`-guarded gather that
  only pays on steps where a row actually finished.
* Tokens scatter straight into the (N, max_length) output array by pool-row
  id, so the loop needs no per-step output collection (while_loop cannot
  emit outputs) and the host gets exactly the array batch-greedy produces.

Exactness: each row decodes with the same step math as `greedy_decode`
(step_k parity is pinned by `tests/test_decoder_step_parity.py` /
`test_custom_decoder_parity.py`), so answers are identical in f32; in bf16
the per-row step's different reduction order can flip near-tie argmaxes (the
repo-wide caveat, README). Opt-in via ``EVAL_CONTINUOUS: true``.

Measured verdict (round 5, TPU v5e, LaTr-base): the step savings are REAL
(~1.6x fewer device steps at the realistic 3-20-token mix) but the per-step
refill gather costs more than it saves — batch greedy wins every probed
regime (pool 5.4x slower at S=16, 3.2x at S=64; 1.4-1.7x slower even at the
all-equal-lengths control). See docs/DESIGN.md "Deliberate no's" and
``scripts/probe_eval_slots.py``. The default stays batch greedy; this path
remains for length mixes with rare extreme outliers (max >> mean).

The reference has no counterpart (its decode re-runs the full prefix per
token, one batch at a time — `/root/reference/core/model/CustomizedLaTr.py:
146-184`); this is a beyond-reference throughput feature.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# step_k_fn(tokens (S, 1[, C]) int32, cache, pos (S,) int32, enc_mask (S, Ls))
#   -> (logits (S, 1, V) f32 — or a tuple of C such, cache)
# enc_mask is part of the call (not a closure constant) because a slot's
# encoder mask changes when it refills with a new pool row.
StepKFn = Callable[[jnp.ndarray, object, jnp.ndarray, jnp.ndarray], Tuple]

#: cache leaves whose row axis is 1 (the continuous engine's convention:
#: (num_layers, rows, ...) for self-attn K/V and cross K/V)
_CACHE_KEYS = ("k", "v", "ck", "cv")


def _take_rows(cache, enc_mask, row_ids):
    """Gather pool rows ``row_ids`` (S,) from a pool cache/enc_mask."""
    got = {n: jnp.take(cache[n], row_ids, axis=1) for n in _CACHE_KEYS}
    return got, jnp.take(enc_mask, row_ids, axis=0)


def pool_greedy_decode(
    step_k_fn: StepKFn,
    pool_cache: dict,
    pool_enc_mask: jnp.ndarray,
    num_slots: int,
    max_length: int,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    num_components: int = 1,
    stop_component: int = 0,
    with_scores: bool = False,
) -> jnp.ndarray:
    """Decode all N pool rows through ``num_slots`` refilling slots.

    Returns (N, max_length) int32 (or (N, max_length, C) for component-tuple
    streams), row-for-row equal to `greedy_decode` / `multi_head_greedy_decode`
    over the same rows. ``with_scores=True`` adds (B,) f32 mean emitted-token
    log-prob with the same semantics as those functions.
    """
    S = int(num_slots)
    N = int(pool_enc_mask.shape[0])
    C = int(num_components)
    maxl = int(max_length)

    # output carries one TRASH row (index N) absorbing idle-slot writes
    out_shape = (N + 1, maxl) if C == 1 else (N + 1, maxl, C)
    out = jnp.full(out_shape, pad_id, jnp.int32)
    if C == 1:
        out = out.at[:, 0].set(bos_id)
    else:
        out = out.at[:, 0, :].set(bos_id)

    # slot state: seed the first min(S, N) slots from the pool directly
    first = jnp.minimum(jnp.arange(S), N - 1).astype(jnp.int32)
    seeded = jnp.arange(S) < N
    cache, enc_mask = _take_rows(pool_cache, pool_enc_mask, first)
    cur_shape = (S,) if C == 1 else (S, C)

    state = dict(
        cache=cache,
        enc_mask=enc_mask,
        pos=jnp.zeros((S,), jnp.int32),
        cur=jnp.full(cur_shape, bos_id, jnp.int32),
        active=seeded,
        slot_row=jnp.where(seeded, first, N).astype(jnp.int32),
        next_row=jnp.int32(min(S, N)),
        out=out,
        sum_lp=jnp.zeros((N + 1,), jnp.float32),
        count=jnp.zeros((N + 1,), jnp.float32),
    )

    def refill(st):
        free = ~st["active"]
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
        assign = free & (rank < (N - st["next_row"]))
        row_ids = jnp.where(assign, st["next_row"] + rank, 0)
        got, got_mask = _take_rows(pool_cache, pool_enc_mask, row_ids)
        sel = lambda nd: assign.reshape((1, S) + (1,) * (nd - 2))
        cache = {
            n: jnp.where(sel(st["cache"][n].ndim), got[n], st["cache"][n])
            for n in _CACHE_KEYS
        }
        keep = assign if C == 1 else assign[:, None]
        return dict(
            st,
            cache=cache,
            enc_mask=jnp.where(assign[:, None], got_mask, st["enc_mask"]),
            pos=jnp.where(assign, 0, st["pos"]),
            cur=jnp.where(keep, bos_id, st["cur"]),
            active=st["active"] | assign,
            slot_row=jnp.where(assign, row_ids, st["slot_row"]),
            next_row=st["next_row"] + jnp.sum(assign.astype(jnp.int32)),
        )

    def cond(st):
        return jnp.any(st["active"]) | (st["next_row"] < N)

    def body(st):
        # the gather only pays on steps right after a row finished: once
        # every slot is live (or the pool is drained) the branch is skipped
        st = lax.cond(
            jnp.any(~st["active"]) & (st["next_row"] < N),
            refill, lambda s: s, st,
        )
        cur = st["cur"][:, None] if C == 1 else st["cur"][:, None, :]
        logits, cache = step_k_fn(cur, st["cache"], st["pos"], st["enc_mask"])
        if C == 1:
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)  # (S,)
            stop_tok = tok
            if with_scores:
                lp = jax.nn.log_softmax(
                    logits[:, 0].astype(jnp.float32), axis=-1
                )
                tok_lp = jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]
        else:
            tok = jnp.stack(
                [jnp.argmax(l[:, 0], axis=-1).astype(jnp.int32)
                 for l in logits],
                axis=-1,
            )  # (S, C)
            stop_tok = tok[:, stop_component]
            if with_scores:
                tok_lp = sum(
                    jnp.take_along_axis(
                        jax.nn.log_softmax(
                            l[:, 0].astype(jnp.float32), axis=-1
                        ),
                        tok[:, c][:, None], axis=1,
                    )[:, 0]
                    for c, l in enumerate(logits)
                )
        # idle slots write into the trash row; active slots into their row
        rows = jnp.where(st["active"], st["slot_row"], N)
        out = st["out"].at[rows, st["pos"] + 1].set(tok)
        sum_lp, count = st["sum_lp"], st["count"]
        if with_scores:
            sum_lp = sum_lp.at[rows].add(
                jnp.where(st["active"], tok_lp, 0.0)
            )
            count = count.at[rows].add(st["active"].astype(jnp.float32) * C)
        new_pos = st["pos"] + st["active"].astype(jnp.int32)
        active = st["active"] & (stop_tok != eos_id) & (new_pos < maxl - 1)
        keep = st["active"] if C == 1 else st["active"][:, None]
        return dict(
            st,
            cache=cache,
            pos=new_pos,
            cur=jnp.where(keep, tok, st["cur"]),
            active=active,
            out=out,
            sum_lp=sum_lp,
            count=count,
        )

    st = lax.while_loop(cond, body, state)
    out = st["out"][:N]
    if with_scores:
        return out, (st["sum_lp"] / jnp.maximum(st["count"], 1.0))[:N]
    return out
