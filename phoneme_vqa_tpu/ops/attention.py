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

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def dot_product_attention(
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
