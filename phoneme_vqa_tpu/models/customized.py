"""Customized{LaTr,PreSTU,SaL}: stock fusion encoders + the custom post-LN
answer decoder over a pluggable answer-tokenizer vocabulary.

Contracts:
* CustomizedLaTr — `/root/reference/core/model/CustomizedLaTr.py:45-272`
  (frozen-ViT T5 *encoder-only* backbone, custom decoder, own lm head)
* CustomizedPreSTU — `core/model/CustomizedPreSTU.py:16-144`
* CustomizedSaL — `core/model/CustomizedSaL.py:29-336` (2D-bias encoder)

Generation is the same KV-cached while_loop greedy as every other family
(the reference re-decodes the full prefix per step); beam search is provided
by `decode/beam.py` with the joint-log-prob semantics the reference intended
(its shipped beam decodes from the greedy stream — `CustomizedLaTr.py:227` —
a documented bug).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..utils.registry import MODEL_CONFIGS, MODELS
from .custom_decoder import CustomDecoder, CustomDecoderConfig
from .latr import LaTr, LaTrConfig, t5_config_from_yaml, vit_config_from_yaml
from .prestu import PreSTU
from .sal import SaLConfig, SaLFusion, train_bias
from .t5 import T5Config


@dataclasses.dataclass(frozen=True)
class CustomizedLaTrConfig(LaTrConfig):
    decoder: CustomDecoderConfig = dataclasses.field(
        default_factory=CustomDecoderConfig
    )


@dataclasses.dataclass(frozen=True)
class CustomizedSaLConfig(SaLConfig):
    decoder: CustomDecoderConfig = dataclasses.field(
        default_factory=CustomDecoderConfig
    )


def decoder_config_from_yaml(config, t5: T5Config, tgt_vocab_size: int,
                             pad_id: int, bos_id: int, eos_id: int) -> CustomDecoderConfig:
    return CustomDecoderConfig(
        vocab_size=tgt_vocab_size,
        d_model=t5.d_model,
        num_heads=config.get("n_head", 12),
        num_layers=config.get("num_decoder_layers", 4),
        dropout_rate=config.get("dropout_rate", 0.1),
        pad_id=pad_id,
        bos_id=bos_id,
        eos_id=eos_id,
        dtype=t5.dtype,
    )


class _CustomizedConfigBuilder:
    """Shared YAML->config logic; reference's *_config classes take the
    decode-tokenizer vocab size at build time (CustomizedLaTr_Executor.py:238)."""

    def _t5_vit(self, config):
        return t5_config_from_yaml(config), vit_config_from_yaml(config)


@MODEL_CONFIGS.register("CustomizedLaTr_config")
class CustomizedLaTr_config(_CustomizedConfigBuilder):
    def build(self, config, tgt_vocab_size: int = 1000, pad_id: int = 0,
              bos_id: int = 1, eos_id: int = 2) -> CustomizedLaTrConfig:
        t5, vit = self._t5_vit(config)
        return CustomizedLaTrConfig(
            t5=t5,
            vit=vit,
            max_2d_position_embeddings=config.get("max_2d_position_embeddings", 1024),
            freeze_vit=True,
            decoder=decoder_config_from_yaml(
                config, t5, tgt_vocab_size, pad_id, bos_id, eos_id
            ),
        )


@MODEL_CONFIGS.register("CustomizedPreSTU_config")
class CustomizedPreSTU_config(_CustomizedConfigBuilder):
    def build(self, config, tgt_vocab_size: int = 1000, pad_id: int = 0,
              bos_id: int = 1, eos_id: int = 2) -> CustomizedLaTrConfig:
        t5, vit = self._t5_vit(config)
        return CustomizedLaTrConfig(
            t5=t5,
            vit=vit,
            freeze_vit=True,
            decoder=decoder_config_from_yaml(
                config, t5, tgt_vocab_size, pad_id, bos_id, eos_id
            ),
        )


@MODEL_CONFIGS.register("CustomizedSaL_config")
class CustomizedSaL_config:
    def build(self, config, tgt_vocab_size: int = 1000, pad_id: int = 0,
              bos_id: int = 1, eos_id: int = 2,
              new_token_embedding_size: int | None = None) -> CustomizedSaLConfig:
        t5 = t5_config_from_yaml(config)
        if new_token_embedding_size:
            t5 = t5.replace(vocab_size=new_token_embedding_size)
        return CustomizedSaLConfig(
            t5=t5,
            ocr_hidden=config.get("ocr_hidden", 512),
            obj_hidden=config.get("obj_hidden", 2048),
            max_ques=config.get("max_q_length", 80),
            max_ocr=config.get("max_ocr_length", 128),
            decoder=decoder_config_from_yaml(
                config, t5, tgt_vocab_size, pad_id, bos_id, eos_id
            ),
        )


class _CustomDecodeMixin:
    """Replaces the T5 decoder with the custom decoder uniformly."""

    # SPEC_DECODE stays off: its prompt-lookup drafts are T5-vocab token ids
    # (OCR/question), vocabulary-mismatched with the pluggable answer
    # tokenizer. Continuous batching keys on decode_step_k instead.
    spec_decode_supported = False

    def _setup_decoder(self):
        self.decoder = CustomDecoder(self.cfg.decoder, name="decoder")

    def __call__(self, batch, labels, label_mask, deterministic: bool = True):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask, deterministic=deterministic)
        return self.decoder(labels, enc_out, enc_mask, label_mask, deterministic)

    def encode_for_generate(self, batch, max_length: int):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask)
        cache = self.decoder.init_cache(enc_out, max_length)
        return cache, jnp.zeros((1, 1, 1, 1)), enc_mask  # no decoder rel bias

    def decode_step(self, tokens, cache, index, full_bias, enc_mask):
        return self.decoder.step(tokens, cache, index, enc_mask)

    def decode_step_k(self, tokens, cache, pos, full_bias, enc_mask):
        """Per-row-position K-token step (continuous batching); full_bias is
        the dummy — the custom decoder has no relative bias."""
        return self.decoder.step_k(tokens, cache, pos, enc_mask)

    @property
    def decode_token_ids(self):
        """(bos, eos, pad) of the ANSWER vocabulary — the decode tokenizer's
        ids baked into the decoder config, not the T5 backbone's."""
        c = self.cfg.decoder
        return c.bos_id, c.eos_id, c.pad_id


@MODELS.register("CustomizedLaTr")
class CustomizedLaTr(_CustomDecodeMixin, LaTr):
    cfg: CustomizedLaTrConfig

    def setup(self):
        LaTr.setup(self)
        self._setup_decoder()


@MODELS.register("CustomizedPreSTU")
class CustomizedPreSTU(_CustomDecodeMixin, PreSTU):
    cfg: CustomizedLaTrConfig

    def setup(self):
        PreSTU.setup(self)
        self._setup_decoder()


@MODELS.register("CustomizedSaL")
class CustomizedSaL(_CustomDecodeMixin, SaLFusion):
    cfg: CustomizedSaLConfig

    def setup(self):
        SaLFusion.setup(self)
        self._setup_decoder()

    # SaL's fuse returns (embeds, mask, bias) — inject the bias
    def __call__(self, batch, labels, label_mask, deterministic: bool = True):
        embeds, enc_mask, bias = self.fuse(batch)
        bias = train_bias(bias, deterministic)
        enc_out = self.t5.encode(
            embeds, enc_mask, position_bias=bias, deterministic=deterministic
        )
        return self.decoder(labels, enc_out, enc_mask, label_mask, deterministic)

    def encode_for_generate(self, batch, max_length: int):
        embeds, enc_mask, bias = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask, position_bias=bias)
        cache = self.decoder.init_cache(enc_out, max_length)
        return cache, jnp.zeros((1, 1, 1, 1)), enc_mask
