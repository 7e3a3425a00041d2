"""SaL: Spatially-aware Language model for scene-text VQA.

Contract (`/root/reference/core/model/SaL.py:24-133`): encoder input is
``concat([T5-embed(question), ocr_embed, obj_embed])`` where each feature
stream embed = RMSNorm(proj(features)) + RMSNorm(proj(bbox4)) + T5-embed(ids);
a 2D relative position bias (1D sequence + SCP spatial on the OCR block) is
injected into the encoder (the reference's `T52dForConditionalGeneration`);
stock T5 decoder + lm_head.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import MODEL_CONFIGS, MODELS
from .latr import _dtype_of, t5_config_from_yaml
from .rel_bias_2d import Sal2DPositionBias


def train_bias(bias, deterministic: bool):
    """Gradient path: hand XLA the materialized (B, H, L, L) bias — measured
    faster for fwd+bwd on v5e than the fused kernel's recompute-VJP (129 vs
    144 ms/step at SaL-base B=32; docs/DESIGN.md). Forward-only paths
    (generate, validate_loss) keep the factored form and the fused kernel."""
    return bias.materialize() if not deterministic else bias
from .t5 import RMSNorm, T5, T5Config


@dataclasses.dataclass(frozen=True)
class SaLConfig:
    t5: T5Config = dataclasses.field(default_factory=T5Config)
    ocr_hidden: int = 512
    obj_hidden: int = 2048
    max_ques: int = 80
    max_ocr: int = 128

    def replace(self, **kw) -> "SaLConfig":
        return dataclasses.replace(self, **kw)


@MODEL_CONFIGS.register("SaL_config")
class SaL_config:
    """YAML -> SaLConfig (reference `SaL_config.build`, `SaL.py:13-21`,
    including the +1 vocab slot for the added ``<c>`` context token)."""

    def build(self, config, new_token_embedding_size: int | None = None) -> SaLConfig:
        t5 = t5_config_from_yaml(config)
        if new_token_embedding_size:
            t5 = t5.replace(vocab_size=new_token_embedding_size)
        return SaLConfig(
            t5=t5,
            ocr_hidden=config.get("ocr_hidden", 512),
            obj_hidden=config.get("obj_hidden", 2048),
            max_ques=config.get("max_q_length", 80),
            max_ocr=config.get("max_ocr_length", 128),
        )


class SaLFusion(nn.Module):
    # the decode cache is the stock T5 decoder's, so the per-row-position
    # K-token step works (speculative verify + continuous-batching slots);
    # the custom-decoder mixins (CustomizedSaL/PhonemeSaL) flip this off
    spec_decode_supported = True
    """Shared fusion + bias for the SaL family."""

    cfg: SaLConfig

    def setup(self):
        t5c = self.cfg.t5
        dense = lambda feat, name: nn.Dense(
            feat, dtype=t5c.dtype, param_dtype=jnp.float32, name=name
        )
        self.t5 = T5(t5c, name="t5")
        self.rel2d = Sal2DPositionBias(t5c.num_heads, name="rel2d")
        self.ocr_feature_projector = dense(t5c.d_model, "ocr_feature_projector")
        self.ocr_bbox_projector = dense(t5c.d_model, "ocr_bbox_projector")
        self.ocr_norm = RMSNorm(t5c.layer_norm_epsilon, t5c.dtype, name="ocr_norm")
        self.obj_feature_projector = dense(t5c.d_model, "obj_feature_projector")
        self.obj_bbox_projector = dense(t5c.d_model, "obj_bbox_projector")
        self.obj_norm = RMSNorm(t5c.layer_norm_epsilon, t5c.dtype, name="obj_norm")

    def _stream_embed(self, ids, coords, features, feature_projector,
                      bbox_projector, norm):
        return (
            norm(feature_projector(features))
            + norm(bbox_projector(coords.astype(jnp.float32)))
            + self.t5.embed(ids)
        )

    def fuse(self, batch: Dict[str, jnp.ndarray]):
        """[question | OCR | OBJ] + 2D position bias (SaL.py:61-74)."""
        ocr = self._stream_embed(
            batch["tokenized_ocr"], batch["ocr_coordinates"], batch["ocr_features"],
            self.ocr_feature_projector, self.ocr_bbox_projector, self.ocr_norm,
        )
        obj = self._stream_embed(
            batch["tokenized_obj"], batch["obj_coordinates"], batch["obj_features"],
            self.obj_feature_projector, self.obj_bbox_projector, self.obj_norm,
        )
        ques = self.t5.embed(batch["input_ids"])
        embeds = jnp.concatenate([ques, ocr, obj], axis=1)
        mask = jnp.concatenate(
            [
                batch["src_attention_mask"].astype(jnp.int32),
                batch["ocr_attention_mask"].astype(jnp.int32),
                batch["obj_attention_mask"].astype(jnp.int32),
            ],
            axis=1,
        )
        bias = self.rel2d(
            embeds.shape[1], batch["ocr_coordinates"],
            self.cfg.max_ques, self.cfg.max_ocr,
        )
        # the (H, L, L) 1D bias is tiled from HBM by the fused kernel every
        # layer — carry it (and the cell table, which sets the kernel's scp
        # matmul dtype) in the compute dtype: bf16 halves traffic and runs
        # the MXU in native mode
        bias = bias._replace(
            bias1d=bias.bias1d.astype(self.cfg.t5.dtype),
            cell_bias=bias.cell_bias.astype(self.cfg.t5.dtype),
        )
        return embeds, mask, bias

    def __call__(self, batch, labels, label_mask, deterministic: bool = True):
        embeds, enc_mask, bias = self.fuse(batch)
        bias = train_bias(bias, deterministic)
        enc_out = self.t5.encode(
            embeds, enc_mask, position_bias=bias, deterministic=deterministic
        )
        return self.t5.decode(
            labels, enc_out, enc_mask, label_mask, deterministic=deterministic
        )

    def encode_for_generate(self, batch, max_length: int):
        embeds, enc_mask, bias = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask, position_bias=bias)
        cache, full_bias = self.t5.init_cache(enc_out, max_length)
        return cache, full_bias, enc_mask

    def decode_step(self, tokens, cache, index, full_bias, enc_mask):
        return self.t5.decode_step(tokens, cache, index, full_bias, enc_mask)

    def decode_step_k(self, tokens, cache, pos, full_bias, enc_mask):
        """K-token step at per-row positions (speculative verification and
        the continuous-batching slot decode)."""
        return self.t5.decode_step_k(tokens, cache, pos, full_bias, enc_mask)


@MODELS.register("SaL")
class SaL(SaLFusion):
    cfg: SaLConfig
