"""LaTr: layout-aware T5 for scene-text VQA.

Contract (`/root/reference/core/model/LaTr.py:42-110`): encoder input is
``concat([ViT(img)->proj, T5-embed(ocr) + SpatialModule(coords),
T5-embed(question)])`` with mask ``[ones(img), ocr_mask, src_mask]``; a full
T5 decoder + lm_head over the fused encoding; greedy generation.

TPU-native: one jitted ``generate`` containing encoder + KV-cached
`lax.while_loop` greedy decode; ViT frozen via `stop_gradient` (the
reference freezes all ViT parameters, `LaTr.py:54-56`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import MODEL_CONFIGS, MODELS
from .spatial import SpatialModule
from .t5 import T5, T5Config
from .vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class LaTrConfig:
    t5: T5Config = dataclasses.field(default_factory=T5Config)
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    max_2d_position_embeddings: int = 1024
    freeze_vit: bool = True

    def replace(self, **kw) -> "LaTrConfig":
        return dataclasses.replace(self, **kw)


@MODEL_CONFIGS.register("LaTr_config")
class LaTr_config:
    """Builds a LaTrConfig from a YAML Config (same role as the reference's
    `LaTr_config.build`, `/root/reference/core/model/LaTr.py:5-12`)."""

    def build(self, config) -> LaTrConfig:
        return LaTrConfig(
            t5=t5_config_from_yaml(config),
            vit=vit_config_from_yaml(config),
            max_2d_position_embeddings=config.get("max_2d_position_embeddings", 1024),
        )


def t5_config_from_yaml(config) -> T5Config:
    """Backbone dims. Defaults are vit5-base (the reference's
    ``backbone_name: VietAI/vit5-base``); YAML keys override so tiny test
    configs and offline runs need no HF AutoConfig."""
    return T5Config(
        vocab_size=config.get("t5_vocab_size", 36096),
        d_model=config.get("d_model", 768),
        d_kv=config.get("d_kv", 64),
        num_heads=config.get("num_heads", 12),
        d_ff=config.get("d_ff", 3072),
        num_layers=config.get("num_encoder_layers", 12),
        num_decoder_layers=config.get("num_t5_decoder_layers", 12),
        feed_forward_proj=config.get("feed_forward_proj", "gated-gelu"),
        tie_word_embeddings=config.get("tie_word_embeddings", True),
        dropout_rate=config.get("dropout_rate", 0.1),
        dtype=_dtype_of(config),
    )


def vit_config_from_yaml(config) -> ViTConfig:
    return ViTConfig(
        image_size=config.get("vit_image_size", 224),
        patch_size=config.get("vit_patch_size", 16),
        hidden_size=config.get("vit_hidden_size", 768),
        num_layers=config.get("vit_num_layers", 12),
        num_heads=config.get("vit_num_heads", 12),
        mlp_dim=config.get("vit_mlp_dim", 3072),
        dtype=_dtype_of(config),
    )


def _dtype_of(config) -> Any:
    name = str(config.get("DTYPE", "bfloat16"))
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


@MODELS.register("LaTr")
class LaTr(nn.Module):
    cfg: LaTrConfig

    def setup(self):
        self.t5 = T5(self.cfg.t5, name="t5")
        self.vit = ViT(self.cfg.vit, name="vit")
        self.visual_projector = nn.Dense(
            self.cfg.t5.d_model,
            dtype=self.cfg.t5.dtype,
            param_dtype=jnp.float32,
            name="visual_projector",
        )
        self.spatial = SpatialModule(
            self.cfg.max_2d_position_embeddings,
            self.cfg.t5.d_model,
            self.cfg.t5.dtype,
            name="spatial",
        )

    # -- fusion ---------------------------------------------------------------

    def calculate_embedding(
        self,
        pixel_values: jnp.ndarray,  # (B, C, H, W)
        coordinates: jnp.ndarray,  # (B, L_ocr, 6) int
        input_ids: jnp.ndarray,  # (B, L_q) question ids
        ocr_attention_mask: jnp.ndarray,  # (B, L_ocr)
        src_attention_mask: jnp.ndarray,  # (B, L_q)
        tokenized_ocr: jnp.ndarray,  # (B, L_ocr)
    ):
        img_feat = self.vit(pixel_values)
        if self.cfg.freeze_vit:
            img_feat = jax.lax.stop_gradient(img_feat)
        img_feat = self.visual_projector(img_feat)
        layout_feat = self.t5.embed(tokenized_ocr) + self.spatial(coordinates)
        lang_feat = self.t5.embed(input_ids)
        embeds = jnp.concatenate([img_feat, layout_feat, lang_feat], axis=1)
        mask = jnp.concatenate(
            [
                jnp.ones(img_feat.shape[:2], jnp.int32),
                ocr_attention_mask.astype(jnp.int32),
                src_attention_mask.astype(jnp.int32),
            ],
            axis=1,
        )
        return embeds, mask

    # -- training forward -------------------------------------------------------

    def __call__(
        self,
        pixel_values,
        coordinates,
        input_ids,
        labels,  # (B, T) decoder input ids (already shifted: "<pad> answer")
        src_attention_mask,
        label_attention_mask,
        ocr_attention_mask,
        tokenized_ocr,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        embeds, enc_mask = self.calculate_embedding(
            pixel_values, coordinates, input_ids, ocr_attention_mask,
            src_attention_mask, tokenized_ocr,
        )
        enc_out = self.t5.encode(embeds, enc_mask, deterministic=deterministic)
        return self.t5.decode(
            labels, enc_out, enc_mask, label_attention_mask, deterministic=deterministic
        )

    # -- generation -------------------------------------------------------------

    def encode_for_generate(
        self, pixel_values, coordinates, input_ids, src_attention_mask,
        ocr_attention_mask, tokenized_ocr, max_length: int,
    ):
        embeds, enc_mask = self.calculate_embedding(
            pixel_values, coordinates, input_ids, ocr_attention_mask,
            src_attention_mask, tokenized_ocr,
        )
        enc_out = self.t5.encode(embeds, enc_mask)
        cache, full_bias = self.t5.init_cache(enc_out, max_length)
        return cache, full_bias, enc_mask

    def decode_step(self, tokens, cache, index, full_bias, enc_mask):
        return self.t5.decode_step(tokens, cache, index, full_bias, enc_mask)


def make_generate_fn(model: LaTr, max_length: int):
    """Builds a jittable greedy generate over a feature batch.

    Equivalent surface to the reference's `LaTr.generate`
    (`/root/reference/core/model/LaTr.py:99-110`), but the whole encoder +
    decode loop compiles to a single XLA program.
    """
    from ..decode.greedy import greedy_decode

    t5c = model.cfg.t5

    def generate(params, batch):
        cache, full_bias, enc_mask = model.apply(
            {"params": params},
            batch["pixel_values"],
            batch["coordinates"],
            batch["input_ids"],
            batch["src_attention_mask"],
            batch["ocr_attention_mask"],
            batch["tokenized_ocr"],
            max_length,
            method=LaTr.encode_for_generate,
        )

        def step(tokens, cache, i):
            return model.apply(
                {"params": params},
                tokens,
                cache,
                i,
                full_bias,
                enc_mask,
                method=LaTr.decode_step,
            )

        return greedy_decode(
            step,
            cache,
            batch_size=batch["input_ids"].shape[0],
            max_length=max_length,
            bos_id=t5c.decoder_start_token_id,
            eos_id=t5c.eos_token_id,
            pad_id=t5c.pad_token_id,
        )

    return generate
