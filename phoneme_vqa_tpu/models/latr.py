"""LaTr: layout-aware T5 for scene-text VQA.

Contract (`/root/reference/core/model/LaTr.py:42-110`): encoder input is
``concat([ViT(img)->proj, T5-embed(ocr) + SpatialModule(coords),
T5-embed(question)])`` with mask ``[ones(img), ocr_mask, src_mask]``; a full
T5 decoder + lm_head over the fused encoding; greedy generation. The
reference freezes the whole ViT (`LaTr.py:54-56`) — here via stop_gradient.

Uniform model surface (shared by every family in this framework):
``__call__(batch, labels, label_mask)`` for the teacher-forced train
forward, ``fuse(batch)``, ``encode_for_generate(batch, max_len)`` and
``decode_step(...)`` for the jitted whole-sequence greedy program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

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


def _dtype_of(config) -> Any:
    name = str(config.get("DTYPE", "bfloat16"))
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


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
        remat=bool(config.get("REMAT", False)),
        scan_layers=bool(config.get("SCAN_LAYERS", False)),
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
        scan_layers=bool(config.get("SCAN_LAYERS", False)),
    )


@MODEL_CONFIGS.register("LaTr_config")
class LaTr_config:
    """YAML Config -> LaTrConfig (role of the reference's `LaTr_config.build`,
    `/root/reference/core/model/LaTr.py:5-12`)."""

    def build(self, config) -> LaTrConfig:
        return LaTrConfig(
            t5=t5_config_from_yaml(config),
            vit=vit_config_from_yaml(config),
            max_2d_position_embeddings=config.get("max_2d_position_embeddings", 1024),
        )


class FusionModel(nn.Module):
    """Shared skeleton: fuse modalities -> T5 encode -> T5 decode/generate."""

    cfg: LaTrConfig
    # families whose decode cache is the stock T5 decoder's support the
    # K-token speculative verification step; custom-decoder mixins flip this
    spec_decode_supported = True

    def _vit_features(self, pixel_values):
        img_feat = self.vit(pixel_values)
        if self.cfg.freeze_vit:
            img_feat = jax.lax.stop_gradient(img_feat)
        return self.visual_projector(img_feat)

    def encode_image(self, pixel_values):
        """Raw ViT encodings (pre-projector): the ``VIT_CACHE`` precompute
        surface. The trainable projector stays inside the step; ``fuse``
        consumes cached encodings through :meth:`_img_features`."""
        return self.vit(pixel_values)

    def _img_features(self, batch):
        """Projected image features from either source: live pixels, or
        precomputed frozen-ViT encodings (``VIT_CACHE`` — the executor swaps
        the batch field; a batch input carries no gradient path to the ViT,
        so this is the stop_gradient branch by construction)."""
        if "vit_encodings" in batch:
            return self.visual_projector(
                jnp.asarray(batch["vit_encodings"], self.cfg.t5.dtype)
            )
        return self._vit_features(batch["pixel_values"])

    def fuse(self, batch: Dict[str, jnp.ndarray]):
        raise NotImplementedError

    def __call__(self, batch, labels, label_mask, deterministic: bool = True):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask, deterministic=deterministic)
        return self.t5.decode(
            labels, enc_out, enc_mask, label_mask, deterministic=deterministic
        )

    def encode_for_generate(self, batch, max_length: int):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask)
        cache, full_bias = self.t5.init_cache(enc_out, max_length)
        return cache, full_bias, enc_mask

    def decode_step(self, tokens, cache, index, full_bias, enc_mask):
        return self.t5.decode_step(tokens, cache, index, full_bias, enc_mask)

    def decode_step_k(self, tokens, cache, pos, full_bias, enc_mask):
        return self.t5.decode_step_k(tokens, cache, pos, full_bias, enc_mask)


@MODELS.register("LaTr")
class LaTr(FusionModel):
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

    def fuse(self, batch):
        """[ViT patches | OCR embed + spatial | question] (LaTr.py:85-97)."""
        img_feat = self._img_features(batch)
        layout_feat = self.t5.embed(batch["tokenized_ocr"]) + self.spatial(
            batch["coordinates"]
        )
        lang_feat = self.t5.embed(batch["input_ids"])
        embeds = jnp.concatenate([img_feat, layout_feat, lang_feat], axis=1)
        mask = jnp.concatenate(
            [
                jnp.ones(img_feat.shape[:2], jnp.int32),
                batch["ocr_attention_mask"].astype(jnp.int32),
                batch["src_attention_mask"].astype(jnp.int32),
            ],
            axis=1,
        )
        return embeds, mask


# backwards-compat alias for the generic generate builder
def make_generate_fn(model, max_length: int, with_scores: bool = False):
    from .generate import make_generate_fn as _mk

    return _mk(model, max_length, with_scores=with_scores)
