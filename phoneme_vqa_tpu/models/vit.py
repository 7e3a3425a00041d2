"""ViT image encoder in flax.linen.

Architectural contract: the reference feeds raw pixel values through HF
`ViTModel` ("google/vit-base-patch16-224-in21k") and projects
`last_hidden_state` — 197 tokens (CLS + 14x14 patches), hidden 768 —
into the T5 embedding space (`/root/reference/core/model/LaTr.py:50-51,86`).
Standard pre-LN ViT: conv patch embedding, learned position embeddings,
scaled dot-product attention with biases, GELU MLP, final LayerNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    # compile the 12 blocks as ONE lax.scan over stacked params (YAML key
    # ``SCAN_LAYERS``, shared with the T5 stacks) — see `t5.T5Config.scan_layers`
    scan_layers: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    def replace(self, **kw) -> "ViTConfig":
        return dataclasses.replace(self, **kw)


class ViTSelfAttention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(dense("query")(x))
        k = split(dense("key")(x))
        v = split(dense("value")(x))
        out = dot_product_attention(q, k, v, scale=head_dim**-0.5)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return dense("out")(out)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        x = x + ViTSelfAttention(cfg, name="attention")(ln("ln_before")(x))
        h = ln("ln_after")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class _ScanViTBlock(ViTBlock):
    """`ViTBlock` with the (carry, ys) signature `nn.scan` expects."""

    def __call__(self, x):
        return ViTBlock.__call__(self, x), None


class ViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values (B, C, H, W) [torch layout, as the reference's .npy
        feature files store them] -> (B, 197, hidden)."""
        cfg = self.cfg
        x = pixel_values.astype(cfg.dtype).transpose(0, 2, 3, 1)  # NHWC for conv
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, P, D)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(cfg.dtype), x], 1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (1, cfg.seq_len, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(cfg.dtype)
        if cfg.scan_layers:
            x, _ = nn.scan(
                _ScanViTBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
            )(cfg, name="blocks")(x)
        else:
            for i in range(cfg.num_layers):
                x = ViTBlock(cfg, name=f"block_{i}")(x)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=jnp.float32, name="final_ln"
        )(x)
