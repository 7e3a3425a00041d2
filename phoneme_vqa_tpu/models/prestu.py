"""PreSTU: OCR-aware T5 without layout embeddings.

Contract (`/root/reference/core/model/PreSTU.py:13-67`): encoder input is
``concat([ViT(img)->proj, T5-embed(question ⊕ OCR ids)])`` — OCR tokens are
fused into ``input_ids`` by the dataset, no bbox/spatial stream; ViT is NOT
frozen (the reference freezes it only for LaTr).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import MODEL_CONFIGS, MODELS
from .latr import FusionModel, LaTrConfig, t5_config_from_yaml, vit_config_from_yaml
from .t5 import T5
from .vit import ViT


@MODEL_CONFIGS.register("PreSTU_config")
class PreSTU_config:
    def build(self, config) -> LaTrConfig:
        return LaTrConfig(
            t5=t5_config_from_yaml(config),
            vit=vit_config_from_yaml(config),
            freeze_vit=False,
        )


@MODELS.register("PreSTU")
class PreSTU(FusionModel):
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

    def fuse(self, batch):
        """[ViT patches | question⊕OCR tokens] (PreSTU.py:48-56)."""
        img_feat = self._img_features(batch)
        lang_feat = self.t5.embed(batch["input_ids"])
        embeds = jnp.concatenate([img_feat, lang_feat], axis=1)
        mask = jnp.concatenate(
            [
                jnp.ones(img_feat.shape[:2], jnp.int32),
                batch["src_attention_mask"].astype(jnp.int32),
            ],
            axis=1,
        )
        return embeds, mask
