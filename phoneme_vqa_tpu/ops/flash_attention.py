"""Pallas fused attention kernel (TPU).

Replaces the XLA default attention for the encoder/teacher-forced paths: the
(B, H, L, L) f32 logits tensor never touches HBM — each grid program loads a
q tile plus the full K/V for its (batch, head), computes logits + additive
bias + masks + softmax in VMEM, and writes only the (BQ, D) output tile.

At this framework's sequence lengths (fused encoder <= ~512 tokens) a single
K block per program is the right design point — online-softmax tiling over K
would only add bookkeeping. Supports the SaL additive position bias
(optionally batch-broadcast), boolean key masking, and causal masking, i.e.
the full `ops.attention.dot_product_attention` contract.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

BLOCK_Q = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale, causal, lq_real,
    block_q=BLOCK_Q,
):
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (LK, D)
    v = v_ref[0, 0]  # (LK, D)

    logits = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, LK)
    if scale is not None:
        logits = logits * scale
    if bias_ref is not None:
        logits = logits + bias_ref[0, 0].astype(jnp.float32)
    if mask_ref is not None:
        keep = mask_ref[0, 0] != 0  # (LK,)
        logits = jnp.where(keep[None, :], logits, NEG_INF)
    if causal:
        iq = pl.program_id(1)
        rows = iq * block_q + lax.broadcasted_iota(
            jnp.int32, logits.shape, 0
        )
        cols = lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(cols <= rows, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = (unnorm / denom).astype(v.dtype)
    o_ref[0, 0] = lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray,  # (B, H, Lq, D)
    k: jnp.ndarray,  # (B, H, Lk, D)
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # (B|1, H, Lq, Lk)
    key_mask: Optional[jnp.ndarray] = None,  # (B, Lk) truthy = attend
    causal: bool = False,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(BLOCK_Q, _round_up(max(lq, 8), 8))
    lq_pad = _round_up(max(lq, 8), block_q)
    lk_pad = _round_up(max(lk, 8), LANE)
    # the head dim is consumed whole per block (block dim == array dim is
    # always legal), so never pad it — padding d doubles traffic and FLOPs
    d_pad = d if d % 8 == 0 else _round_up(d, 8)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))

    # padded keys must be masked off; (B, 1, LK) so block dims == array dims
    if key_mask is None:
        key_mask = jnp.ones((b, lk), jnp.int32)
    maskp = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, lk_pad - lk)))
    maskp = maskp[:, None, :]

    grid = (h, lq_pad // block_q, b)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad), lambda ih, iq, ib: (ib, ih, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk_pad, d_pad), lambda ih, iq, ib: (ib, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk_pad, d_pad), lambda ih, iq, ib: (ib, ih, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]

    if bias is not None:
        bias_b = bias.shape[0]
        biasp = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, 0), (0, lq_pad - lq), (0, lk_pad - lk)),
        )
        if bias_b == 1:
            # index_map ignores ib -> the block is revisited (not re-fetched)
            # across the fastest-varying batch dimension
            bspec = pl.BlockSpec(
                (1, 1, block_q, lk_pad), lambda ih, iq, ib: (0, ih, iq, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            bspec = pl.BlockSpec(
                (1, 1, block_q, lk_pad), lambda ih, iq, ib: (ib, ih, iq, 0),
                memory_space=pltpu.VMEM,
            )
        in_specs.append(bspec)
        args.append(biasp)

    in_specs.append(
        pl.BlockSpec((1, 1, lk_pad), lambda ih, iq, ib: (ib, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(maskp)

    kernel = functools.partial(
        _attn_kernel if bias is not None else _attn_kernel_nobias,
        scale=scale,
        causal=causal,
        lq_real=lq,
        block_q=block_q,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda ih, iq, ib: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_pad * lk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :, :lq, :d]


def _attn_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, causal,
                        lq_real, block_q=BLOCK_Q):
    _attn_kernel(q_ref, k_ref, v_ref, None, mask_ref, o_ref,
                 scale=scale, causal=causal, lq_real=lq_real, block_q=block_q)
