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
# 1x TPU v5e at this framework's shapes (B=32, H=12, L=327, D=64, bf16,
# dispatch-amortized): XLA-default attention 1.5ms vs the Pallas kernel
# 3.3ms — XLA's fusion pipeline is already near its bandwidth roofline at
# these sequence lengths, so the kernel is OFF by default and kept as an
# opt-in (`enable_flash(True)`) for regimes where it wins (longer
# sequences). Single-step decode (Lq == 1) and CPU always use the XLA path.
FLASH_ENABLED = False
_FLASH_MIN_QLEN = 16


def enable_flash(enabled: bool = True) -> None:
    global FLASH_ENABLED
    FLASH_ENABLED = enabled


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
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


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
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
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
