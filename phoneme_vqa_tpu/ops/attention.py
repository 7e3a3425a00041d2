"""Attention core.

One attention implementation serves every model in the framework (T5
encoder/decoder, ViT, the customized decoders): batched multi-head dot
product attention with an optional additive bias (T5 relative bias / SaL 2D
spatial bias), boolean key masking, and f32 softmax for bf16 stability.

MXU notes: logits/softmax run in f32 (`preferred_element_type`), the two
matmuls stay in the input dtype (bf16 on TPU), and everything is laid out
(B, H, L, D) so XLA tiles the contractions onto the MXU without transposes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9

# Pallas fused-attention dispatch (see ops/flash_attention.py). Measured on
# 1x TPU v5e (bf16, H=12, D=64, overhead-cancelled): XLA-default attention
# beats the kernel at EVERY length — 0.56 vs 1.0 ms at B=32 L=336, 0.68 vs
# 1.57 at B=8 L=1024, 1.12 vs 2.71 at B=4 L=2048, 2.33 vs 5.34 at B=2
# L=4096 — XLA's fusion pipeline is already near its bandwidth roofline, so
# the kernel is OFF by default and kept only as an opt-in
# (`enable_flash(True)`) escape hatch. Single-step decode (Lq == 1) and CPU
# always use the XLA path. The kernel that DOES pay is the fused SaL-bias
# variant (SAL_FUSED_ENABLED below).
FLASH_ENABLED = False
_FLASH_MIN_QLEN = 16

# The fused SaL-bias kernel (ops/sal_fused_attention.py) rebuilds the
# (B, H, L, L) bias inside the attention tile from small factors, removing
# its HBM traffic. Measured on 1x TPU v5e (docs/DESIGN.md): time-NEUTRAL
# end to end (56.0 vs 55.1 ms/batch at SaL-base B=32), and the round-3
# batch-ceiling probe (`scripts/probe_sal_batch_ceiling.py`) found the SAME
# max generate batch (512) for both paths — the claimed HBM headroom never
# cashed into a real capability. Defaults follow measurements: OPT-IN via
# `SAL_FUSED: true` (it remains fully tested, incl. a trained-weights
# answer-agreement gate in test_sal_fused_attention.py).
SAL_FUSED_ENABLED = False


def enable_flash(enabled: bool = True) -> None:
    global FLASH_ENABLED
    FLASH_ENABLED = enabled


def enable_sal_fused(enabled: bool = True) -> None:
    global SAL_FUSED_ENABLED
    SAL_FUSED_ENABLED = enabled


def reference_attention(
    q: jnp.ndarray,  # (B, H, Lq, D)
    k: jnp.ndarray,  # (B, H, Lk, D)
    v: jnp.ndarray,  # (B, H, Lk, D)
    bias: Optional[jnp.ndarray] = None,  # (B or 1, H, Lq, Lk) additive
    key_mask: Optional[jnp.ndarray] = None,  # (B, Lk) True/1 = attend
    causal: bool = False,
    scale: Optional[float] = None,  # None = no scaling (T5 convention)
) -> jnp.ndarray:
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if scale is not None:
        logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        rows = lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        cols = lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        logits = jnp.where((cols <= rows)[None, None], logits, NEG_INF)
    # softmax with the normalization divide moved PAST the A·V matmul
    # (linear, so identical math): the (B, H, Lq, Lk) exp tensor can then be
    # written in the compute dtype instead of f32 — on v5e this stage is
    # bandwidth-bound and was ~0.9 ms/layer at L=327 f32 (profiled; halved in
    # bf16). The denominator is still accumulated in f32 from the same
    # fusion, and the divide lands on the Lk-times-smaller output.
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm_f32 = jnp.exp(logits - m)
    denom = jnp.sum(unnorm_f32, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", unnorm_f32.astype(v.dtype), v)
    return out * (1.0 / denom).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash(q, k, v, bias, key_mask, causal, scale):
    from .flash_attention import fused_attention

    return fused_attention(q, k, v, bias, key_mask, causal=causal, scale=scale)


def _flash_fwd(q, k, v, bias, key_mask, causal, scale):
    return _flash(q, k, v, bias, key_mask, causal, scale), (q, k, v, bias, key_mask)


def _flash_bwd(causal, scale, residuals, g):
    # backward recomputes the XLA reference path (still fused by XLA); the
    # forward-only serving path gets the kernel with zero autodiff risk
    q, k, v, bias, key_mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: reference_attention(
            q_, k_, v_, b_, key_mask, causal, scale
        ),
        q, k, v, bias,
    )
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias=None,  # ndarray (B|1, H, Lq, Lk) or FusedSalBias
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    from .sal_fused_attention import FusedSalBias

    if isinstance(bias, FusedSalBias):
        from .sal_fused_attention import INTERPRET

        fusable = (
            SAL_FUSED_ENABLED
            and (jax.default_backend() == "tpu" or INTERPRET)
            and not causal
            and scale is None
            and q.shape[-2] == k.shape[-2]
        )
        if fusable:
            from .sal_fused_attention import sal_attention

            mask = (
                jnp.ones(k.shape[:1] + k.shape[2:3], jnp.int32)
                if key_mask is None
                else key_mask.astype(jnp.int32)
            )
            return sal_attention(
                q, k, v, bias.bias1d, bias.cell_bias, bias.cell, mask
            )
        bias = bias.materialize()
    use_flash = (
        FLASH_ENABLED
        and jax.default_backend() == "tpu"
        and q.shape[-2] >= _FLASH_MIN_QLEN
        and (key_mask is None or key_mask.ndim == 2)
    )
    if use_flash:
        mask = None if key_mask is None else key_mask.astype(jnp.int32)
        return _flash(q, k, v, bias, mask, causal, scale)
    return reference_attention(q, k, v, bias, key_mask, causal, scale)
