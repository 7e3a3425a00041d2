"""Customized answer decoder: post-LN transformer decoder over a T5 encoder.

Contract (`/root/reference/core/model/CustomizedLaTr.py:45-272` and
`core/model/modules/transformer_utils.py:6-64`): token embedding scaled by
sqrt(d_model), sinusoidal positional encoding, a torch
``nn.TransformerDecoder``-equivalent stack (post-LayerNorm residual blocks,
scaled dot-product attention with projection biases, ReLU FFN of width 2048),
and a Linear lm head onto the pluggable answer-tokenizer vocabulary.

TPU-native: same explicit functional KV-cache as the T5 decoder, so
generation runs as one `lax.while_loop` — the reference re-decodes the whole
prefix every step with no cache (`CustomizedLaTr.py:146-184`), its single
biggest inference defect.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention

Cache = List[Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class CustomDecoderConfig:
    vocab_size: int = 1000
    d_model: int = 768
    num_heads: int = 12
    num_layers: int = 4
    d_ff: int = 2048  # torch TransformerDecoderLayer default
    dropout_rate: float = 0.1
    max_len: int = 5000
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    dtype: Any = jnp.bfloat16


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos PE (transformer_utils.py:6-25)."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    div = np.exp(-np.arange(0, d_model, 2) * (np.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model), np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (biased projections, scaled)."""

    cfg: CustomDecoderConfig

    def setup(self):
        c = self.cfg
        mk = lambda name: nn.Dense(
            c.d_model, dtype=c.dtype, param_dtype=jnp.float32, name=name
        )
        self.q_proj, self.k_proj, self.v_proj, self.out = (
            mk("q"), mk("k"), mk("v"), mk("out"),
        )

    def _split(self, x):
        b, l, _ = x.shape
        h = self.cfg.num_heads
        return x.reshape(b, l, h, -1).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def _scale(self):
        return (self.cfg.d_model // self.cfg.num_heads) ** -0.5

    def __call__(self, x, kv=None, key_mask=None, causal=False):
        kv = x if kv is None else kv
        out = dot_product_attention(
            self._split(self.q_proj(x)),
            self._split(self.k_proj(kv)),
            self._split(self.v_proj(kv)),
            key_mask=key_mask,
            causal=causal,
            scale=self._scale(),
        )
        return self.out(self._merge(out))

    def project_kv(self, x):
        return self._split(self.k_proj(x)), self._split(self.v_proj(x))

    def step(self, x, cache_k, cache_v, index, key_mask=None):
        """Cache-write-free decode step (see T5Attention.step): the current
        position's K/V contribution is folded in with a select; the caller
        performs ONE stacked cache write per step for all layers.
        Returns (out, k_new, v_new)."""
        q = self._split(self.q_proj(x))
        k_new = self._split(self.k_proj(x))
        v_new = self._split(self.v_proj(x))
        t = cache_k.shape[2]

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_k, preferred_element_type=jnp.float32
        ) * self._scale()
        logit_new = jnp.einsum(
            "bhqd,bhqd->bhq", q, k_new, preferred_element_type=jnp.float32
        )[..., None] * self._scale()
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        logits = jnp.where(pos == index, logit_new, logits)
        keep = pos <= index
        if key_mask is not None:
            keep = keep & key_mask[:, None, None, :]
        logits = jnp.where(keep, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(cache_v.dtype)
        at_index = (pos == index).astype(probs.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs * (1 - at_index), cache_v)
        out = out + jnp.sum(probs * at_index, axis=3, keepdims=True) * v_new
        return self.out(self._merge(out)), k_new, v_new

    def cross_step(self, x, cached_k, cached_v, key_mask=None):
        q = self._split(self.q_proj(x))
        out = dot_product_attention(
            q, cached_k, cached_v, key_mask=key_mask, scale=self._scale()
        )
        return self.out(self._merge(out))

    def step_k(self, x, cache_k, cache_v, pos):
        """K-token self-attention window at PER-ROW positions (the
        T5Attention.step_k analog, minus relative bias): queries attend the
        cache strictly before their row's window plus a causal (K, K)
        in-window block; no cache write here (the caller scatters all
        layers' window K/V in one one-hot merge).
        x (B, K, D), pos (B,) -> (out (B, K, D), k_new, v_new (B, H, K, d))."""
        q = self._split(self.q_proj(x))
        k_new = self._split(self.k_proj(x))
        v_new = self._split(self.v_proj(x))
        t = cache_k.shape[2]
        kk = q.shape[2]
        scale = self._scale()

        logits_cache = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_k, preferred_element_type=jnp.float32
        ) * scale
        logits_win = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_new, preferred_element_type=jnp.float32
        ) * scale
        tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        keep_cache = tpos < pos[:, None, None, None]  # strictly before window
        logits_cache = jnp.where(keep_cache, logits_cache, -1e9)
        jq = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 0)
        jk = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 1)
        logits_win = jnp.where(jk <= jq, logits_win, -1e9)

        joint = jnp.concatenate([logits_cache, logits_win], axis=-1)
        probs = jax.nn.softmax(joint, axis=-1).astype(cache_v.dtype)
        p_cache, p_win = probs[..., :t], probs[..., t:]
        out = jnp.einsum("bhqk,bhkd->bhqd", p_cache, cache_v) + jnp.einsum(
            "bhqk,bhkd->bhqd", p_win, v_new
        )
        return self.out(self._merge(out)), k_new, v_new


class DecoderLayer(nn.Module):
    """Post-LN: x = LN(x + sublayer(x)) (torch norm_first=False default)."""

    cfg: CustomDecoderConfig

    def setup(self):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=c.dtype, param_dtype=jnp.float32, name=name
        )
        dense = lambda feat, name: nn.Dense(
            feat, dtype=c.dtype, param_dtype=jnp.float32, name=name
        )
        self.self_attn = MHA(c, name="self_attn")
        self.cross_attn = MHA(c, name="cross_attn")
        self.ln1, self.ln2, self.ln3 = ln("ln1"), ln("ln2"), ln("ln3")
        self.fc1 = dense(c.d_ff, "fc1")
        self.fc2 = dense(c.d_model, "fc2")
        self.drop = nn.Dropout(c.dropout_rate, name="drop")

    def _ffn(self, x, deterministic=True):
        h = self.drop(jax.nn.relu(self.fc1(x)), deterministic=deterministic)
        return self.fc2(h)

    def __call__(self, x, memory, memory_mask=None, tgt_keep_mask=None,
                 deterministic: bool = True):
        d = deterministic
        x = self.ln1(x + self.drop(
            self.self_attn(x, key_mask=tgt_keep_mask, causal=True), deterministic=d))
        x = self.ln2(x + self.drop(
            self.cross_attn(x, kv=memory, key_mask=memory_mask), deterministic=d))
        return self.ln3(x + self.drop(self._ffn(x, d), deterministic=d))

    def step(self, x, cache_k, cache_v, cross_k, cross_v, index, memory_mask=None):
        h, k_new, v_new = self.self_attn.step(x, cache_k, cache_v, index)
        x = self.ln1(x + h)
        x = self.ln2(x + self.cross_attn.cross_step(x, cross_k, cross_v, memory_mask))
        x = self.ln3(x + self._ffn(x))
        return x, k_new, v_new

    def step_k(self, x, cache_k, cache_v, cross_k, cross_v, pos, memory_mask=None):
        h, k_new, v_new = self.self_attn.step_k(x, cache_k, cache_v, pos)
        x = self.ln1(x + h)
        x = self.ln2(x + self.cross_attn.cross_step(x, cross_k, cross_v, memory_mask))
        x = self.ln3(x + self._ffn(x))
        return x, k_new, v_new


def per_row_pe_rows(pe: jnp.ndarray, pos: jnp.ndarray, kk: int) -> jnp.ndarray:
    """Sinusoidal PE rows for a K-token window at per-row start positions:
    (maxlen, D), (B,) -> (B, K, D), clamped at the table end."""
    qpos = pos[:, None] + jnp.arange(kk, dtype=pos.dtype)[None, :]
    qpos = jnp.minimum(qpos, pe.shape[0] - 1)
    return jnp.take(pe, qpos.reshape(-1), axis=0).reshape(
        pos.shape[0], kk, pe.shape[1]
    )


def scatter_window_kv(cache: Dict[str, jnp.ndarray], k_news, v_news,
                      pos: jnp.ndarray, t: int, kk: int):
    """Scatter (L, B, H, K, d) window K/V into the stacked (L, B, H, T, d)
    cache at per-row positions pos..pos+K-1 with a one-hot merge — exactly
    two cache writes per step for all layers (T5Decoder.step_k's scheme)."""
    qpos = pos[:, None] + jnp.arange(kk, dtype=pos.dtype)[None, :]
    qpos = jnp.minimum(qpos, t - 1)
    tpos = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    onehot = (tpos == qpos[:, None, :]).astype(cache["k"].dtype)  # (B, T, K)
    keep_old = (1.0 - jnp.minimum(onehot.sum(-1), 1.0))[None, :, None, :, None]
    new_k = cache["k"] * keep_old + jnp.einsum("btj,lbhjd->lbhtd", onehot, k_news)
    new_v = cache["v"] * keep_old + jnp.einsum("btj,lbhjd->lbhtd", onehot, v_news)
    return dict(cache, k=new_k, v=new_v)


class CustomDecoder(nn.Module):
    """Scaled token embedding + sinusoidal PE + post-LN decoder stack +
    lm head (the BaseDecoder/TokenEmbedding/SinusoidalPositionalEncoding
    composite, transformer_utils.py:27-64)."""

    cfg: CustomDecoderConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(
            c.vocab_size, c.d_model, param_dtype=jnp.float32, name="embed"
        )
        self.layers = [
            DecoderLayer(c, name=f"layer_{i}") for i in range(c.num_layers)
        ]
        self.lm_head = nn.Dense(
            c.vocab_size, dtype=c.dtype, param_dtype=jnp.float32, name="lm_head"
        )
        self.pe_drop = nn.Dropout(c.dropout_rate, name="pe_drop")
        self.pe = jnp.asarray(sinusoidal_table(c.max_len, c.d_model))

    def _embed(self, ids, offset: int | jnp.ndarray = 0):
        c = self.cfg
        x = self.embed(ids) * np.sqrt(c.d_model)
        t = ids.shape[1]
        if isinstance(offset, int) and offset == 0:
            pe = self.pe[:t]
        else:
            pe = jax.lax.dynamic_slice(self.pe, (offset, 0), (t, c.d_model))
        return (x + pe[None]).astype(c.dtype)

    def __call__(self, tgt_ids, memory, memory_mask=None, tgt_keep_mask=None,
                 deterministic: bool = True):
        """Teacher-forced: (B, T) ids -> (B, T, V) f32 logits."""
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        tgt_keep_mask = None if tgt_keep_mask is None else tgt_keep_mask.astype(bool)
        x = self.pe_drop(self._embed(tgt_ids), deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, memory.astype(self.cfg.dtype), memory_mask, tgt_keep_mask,
                      deterministic)
        return self.lm_head(x).astype(jnp.float32)

    def init_cache(self, memory, max_len: int):
        """Stacked (L, B, H, T, d) cache — one K and one V buffer for all
        layers, written with a single dynamic_update_slice per step."""
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

    def _run_steps(self, x, cache, index, memory_mask):
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
        return x, dict(cache, k=new_k, v=new_v)

    def step(self, tokens: jnp.ndarray, cache, index, memory_mask=None):
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        x = self._embed(tokens[:, None], offset=index)
        x, cache = self._run_steps(x, cache, index, memory_mask)
        return self.lm_head(x).astype(jnp.float32)[:, 0], cache

    def step_k(self, tokens: jnp.ndarray, cache, pos, memory_mask=None):
        """K-token decode step at PER-ROW positions (continuous batching /
        speculative verification): tokens (B, K), pos (B,) ->
        ((B, K, V) f32 logits, new cache)."""
        c = self.cfg
        memory_mask = None if memory_mask is None else memory_mask.astype(bool)
        kk = tokens.shape[1]
        x = self.embed(tokens) * np.sqrt(c.d_model)
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
        return self.lm_head(x).astype(jnp.float32), cache
