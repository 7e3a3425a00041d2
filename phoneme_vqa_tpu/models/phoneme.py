"""Phoneme decoding models — the framework's distinguishing capability.

* PhonemeLaTr / PhonemePreSTU — (onset, rhyme, tone) TRIPLE streams: a
  3-component embedding (dims onset = d - 2*(d//3), rhyme = tone = d//3,
  `/root/reference/core/model/PhonemeLaTr.py:69-78`), a custom decoder, a
  shared d->d lm projection whose output is sliced per component into three
  heads (`PhonemeLaTr.py:90-96,121-131`). Greedy decoding argmaxes each head
  independently per step and stops a row when its onset emits EOS
  (`PhonemeLaTr.py:198-214`).
  Two reference bugs fixed by design (documented): the shipped
  `PhonemeEmbedding` has a 2-arg def but 5-arg call sites (the intended
  3-embedding version lives in `PhonoLaTr/modules.py:27-63`), and
  `greedy_generate` skips the shared lm projection that `forward` applies
  (`PhonemeLaTr.py:196-204` vs `:121`) — we apply it on both paths.

* PhonemeSaL — a FLAT phoneme stream over the closed phoneme vocabulary
  (`core/model/PhonemeSaL.py:28-207`): SaL fusion encoder + the custom
  decoder with an unscaled token embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import MODELS
from .custom_decoder import (
    CustomDecoderConfig,
    DecoderLayer,
    per_row_pe_rows,
    scatter_window_kv,
    sinusoidal_table,
)
from .customized import CustomizedSaLConfig, _CustomDecodeMixin
from .latr import LaTr, LaTrConfig
from .prestu import PreSTU
from .sal import SaLFusion, train_bias


@dataclasses.dataclass(frozen=True)
class PhonemeDecoderConfig:
    onset_vocab: int = 64
    rhyme_vocab: int = 256
    tone_vocab: int = 16
    d_model: int = 768
    num_heads: int = 12
    num_layers: int = 4
    d_ff: int = 2048
    dropout_rate: float = 0.1
    max_len: int = 5000
    pad_id: int = 2
    bos_id: int = 3
    eos_id: int = 4
    dtype: Any = jnp.bfloat16

    @property
    def rt_dim(self) -> int:
        return self.d_model // 3

    @property
    def onset_dim(self) -> int:
        return self.d_model - 2 * self.rt_dim


@dataclasses.dataclass(frozen=True)
class PhonemeLaTrConfig(LaTrConfig):
    phoneme_decoder: PhonemeDecoderConfig = dataclasses.field(
        default_factory=PhonemeDecoderConfig
    )


class PhonemeTripleDecoder(nn.Module):
    """Triple-stream decoder: 3-part embedding -> post-LN stack ->
    shared projection -> 3 sliced heads."""

    cfg: PhonemeDecoderConfig

    def setup(self):
        c = self.cfg
        layer_cfg = CustomDecoderConfig(
            vocab_size=1,  # unused; layers only need dims
            d_model=c.d_model,
            num_heads=c.num_heads,
            num_layers=c.num_layers,
            d_ff=c.d_ff,
            dropout_rate=c.dropout_rate,
            dtype=c.dtype,
        )
        embed = lambda v, d, name: nn.Embed(v, d, param_dtype=jnp.float32, name=name)
        self.onset_embed = embed(c.onset_vocab, c.onset_dim, "onset_embed")
        self.rhyme_embed = embed(c.rhyme_vocab, c.rt_dim, "rhyme_embed")
        self.tone_embed = embed(c.tone_vocab, c.rt_dim, "tone_embed")
        self.layers = [
            DecoderLayer(layer_cfg, name=f"layer_{i}") for i in range(c.num_layers)
        ]
        dense = lambda feat, name: nn.Dense(
            feat, dtype=c.dtype, param_dtype=jnp.float32, name=name
        )
        self.shared_lm_head = dense(c.d_model, "shared_lm_head")
        self.onset_lm_head = dense(c.onset_vocab, "onset_lm_head")
        self.rhyme_lm_head = dense(c.rhyme_vocab, "rhyme_lm_head")
        self.tone_lm_head = dense(c.tone_vocab, "tone_lm_head")
        self.pe_drop = nn.Dropout(c.dropout_rate, name="pe_drop")
        self.pe = jnp.asarray(sinusoidal_table(c.max_len, c.d_model))

    def _embed(self, triples: jnp.ndarray, offset=0):
        """(B, T, 3) -> (B, T, d): concat of per-component embeddings + PE."""
        c = self.cfg
        x = jnp.concatenate(
            [
                self.onset_embed(triples[..., 0]),
                self.rhyme_embed(triples[..., 1]),
                self.tone_embed(triples[..., 2]),
            ],
            axis=-1,
        )
        t = triples.shape[1]
        if isinstance(offset, int) and offset == 0:
            pe = self.pe[:t]
        else:
            pe = jax.lax.dynamic_slice(self.pe, (offset, 0), (t, c.d_model))
        return (x + pe[None]).astype(c.dtype)

    def _heads(self, hidden: jnp.ndarray):
        c = self.cfg
        shared = self.shared_lm_head(hidden)
        onset = self.onset_lm_head(shared[..., : c.onset_dim])
        rhyme = self.rhyme_lm_head(shared[..., c.onset_dim : c.onset_dim + c.rt_dim])
        tone = self.tone_lm_head(shared[..., c.onset_dim + c.rt_dim :])
        return (
            onset.astype(jnp.float32),
            rhyme.astype(jnp.float32),
            tone.astype(jnp.float32),
        )

    def __call__(self, triples, memory, memory_mask=None, tgt_keep_mask=None,
                 deterministic: bool = True):
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        tgt_keep_mask = None if tgt_keep_mask is None else tgt_keep_mask.astype(bool)
        x = self.pe_drop(self._embed(triples), deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, memory.astype(self.cfg.dtype), memory_mask, tgt_keep_mask,
                      deterministic)
        return self._heads(x)

    def init_cache(self, memory, max_len: int):
        c = self.cfg
        b = memory.shape[0]
        dh = c.d_model // c.num_heads
        n = len(self.layers)
        cks, cvs = [], []
        for layer in self.layers:
            ck, cv = layer.cross_attn.project_kv(memory.astype(c.dtype))
            cks.append(ck)
            cvs.append(cv)
        return {
            "k": jnp.zeros((n, b, c.num_heads, max_len, dh), c.dtype),
            "v": jnp.zeros((n, b, c.num_heads, max_len, dh), c.dtype),
            "ck": jnp.stack(cks),
            "cv": jnp.stack(cvs),
        }

    def step(self, triples, cache, index, memory_mask=None):
        """triples (B, 3) -> (3-tuple of (B, V_c) logits, cache)."""
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        x = self._embed(triples[:, None, :], offset=index)
        k_news, v_news = [], []
        for l, layer in enumerate(self.layers):
            x, k_new, v_new = layer.step(
                x, cache["k"][l], cache["v"][l], cache["ck"][l], cache["cv"][l],
                index, memory_mask,
            )
            k_news.append(k_new)
            v_news.append(v_new)
        new_k = jax.lax.dynamic_update_slice(
            cache["k"], jnp.stack(k_news), (0, 0, 0, index, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            cache["v"], jnp.stack(v_news), (0, 0, 0, index, 0)
        )
        cache = dict(cache, k=new_k, v=new_v)
        onset, rhyme, tone = self._heads(x)
        return (onset[:, 0], rhyme[:, 0], tone[:, 0]), cache

    def step_k(self, triples, cache, pos, memory_mask=None):
        """K-triple decode step at PER-ROW positions (continuous batching):
        triples (B, K, 3), pos (B,) -> (3-tuple of (B, K, V_c) f32 logits,
        new cache)."""
        c = self.cfg
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        kk = triples.shape[1]
        x = jnp.concatenate(
            [
                self.onset_embed(triples[..., 0]),
                self.rhyme_embed(triples[..., 1]),
                self.tone_embed(triples[..., 2]),
            ],
            axis=-1,
        )
        x = (x + per_row_pe_rows(self.pe, pos, kk)).astype(c.dtype)
        k_news, v_news = [], []
        for l, layer in enumerate(self.layers):
            x, k_new, v_new = layer.step_k(
                x, cache["k"][l], cache["v"][l], cache["ck"][l], cache["cv"][l],
                pos, memory_mask,
            )
            k_news.append(k_new)
            v_news.append(v_new)
        cache = scatter_window_kv(
            cache, jnp.stack(k_news), jnp.stack(v_news), pos,
            cache["k"].shape[3], kk,
        )
        return self._heads(x), cache


def phoneme_decoder_from_yaml(config, t5, onset_vocab, rhyme_vocab, tone_vocab,
                              pad_id, bos_id, eos_id) -> PhonemeDecoderConfig:
    return PhonemeDecoderConfig(
        onset_vocab=onset_vocab,
        rhyme_vocab=rhyme_vocab,
        tone_vocab=tone_vocab,
        d_model=t5.d_model,
        num_heads=config.get("n_head", 12),
        num_layers=config.get("num_decoder_layers", 4),
        dropout_rate=config.get("dropout_rate", 0.1),
        pad_id=pad_id,
        bos_id=bos_id,
        eos_id=eos_id,
        dtype=t5.dtype,
    )


class _PhonemeTripleMixin:
    """Triple-decoder plumbing over any fusion encoder."""

    # SPEC_DECODE stays off (single-stream prompt-lookup drafts can't feed a
    # triple stream); continuous batching keys on decode_step_k +
    # decode_components instead.
    spec_decode_supported = False
    decode_components = 3

    def _setup_decoder(self):
        self.decoder = PhonemeTripleDecoder(self.cfg.phoneme_decoder, name="decoder")

    def __call__(self, batch, labels, label_mask, deterministic: bool = True):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask, deterministic=deterministic)
        return self.decoder(labels, enc_out, enc_mask, label_mask, deterministic)

    def encode_for_generate(self, batch, max_length: int):
        embeds, enc_mask = self.fuse(batch)
        enc_out = self.t5.encode(embeds, enc_mask)
        cache = self.decoder.init_cache(enc_out, max_length)
        return cache, jnp.zeros((1, 1, 1, 1)), enc_mask

    def decode_step(self, tokens, cache, index, full_bias, enc_mask):
        return self.decoder.step(tokens, cache, index, enc_mask)

    def decode_step_k(self, tokens, cache, pos, full_bias, enc_mask):
        """Per-row-position K-triple step (continuous batching)."""
        return self.decoder.step_k(tokens, cache, pos, enc_mask)

    @property
    def decode_token_ids(self):
        c = self.cfg.phoneme_decoder
        return c.bos_id, c.eos_id, c.pad_id


@MODELS.register("PhonemeLaTr")
class PhonemeLaTr(_PhonemeTripleMixin, LaTr):
    cfg: PhonemeLaTrConfig

    def setup(self):
        LaTr.setup(self)
        self._setup_decoder()


@MODELS.register("PhonemePreSTU")
class PhonemePreSTU(_PhonemeTripleMixin, PreSTU):
    cfg: PhonemeLaTrConfig

    def setup(self):
        PreSTU.setup(self)
        self._setup_decoder()


@MODELS.register("PhonemeSaL")
class PhonemeSaL(_CustomDecodeMixin, SaLFusion):
    """Flat phoneme stream over the SaL encoder (PhonemeSaL.py:28-207).
    Architecturally the CustomizedSaL decoder with the flat phoneme vocab
    (the reference uses an unscaled nn.Embedding; we keep the custom
    decoder's scaled embedding — train-time-equivalent reparameterization)."""

    cfg: CustomizedSaLConfig

    def setup(self):
        SaLFusion.setup(self)
        self._setup_decoder()

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
