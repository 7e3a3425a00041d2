"""T5 encoder-decoder in flax.linen, built for TPU decode.

Architectural contract (what the reference gets from HF `transformers.models.t5`
via `T5ForConditionalGeneration` — `/root/reference/core/model/LaTr.py:47` —
and its fork `T52DStack`/`T52dForConditionalGeneration` which accepts an
externally injected encoder position bias —
`/root/reference/core/model/modules/SaL_utils.py:226-598`):

* RMS layer norm (no mean subtraction, no bias), pre-norm residual blocks
* relative position bias computed once per stack and shared by every layer;
  encoder bias may be *injected* by the caller (the SaL 2D spatial bias)
* no attention logit scaling (folded into init, T5 convention)
* optional gated-gelu or relu feed-forward
* tied or untied lm head (tied heads scale hidden by d_model**-0.5)

TPU-native design decisions (not in the reference):
* decoding uses an explicit functional KV cache threaded through
  `decode_step` so the whole autoregressive loop lives inside one
  `lax.while_loop` under jit — no per-step host round trips
* cross-attention K/V are projected once per sequence in `init_cache`
  (HF re-checks per step)
* all shapes static; masks are boolean key masks folded in at f32
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.rel_bias import relative_position_bucket

Cache = List[Dict[str, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 12
    num_decoder_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # or "relu"
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    dtype: Any = jnp.bfloat16
    # gradient checkpointing: rematerialize each block's activations in the
    # backward pass (YAML key ``REMAT``) — trades ~1/3 more FLOPs for O(layers)
    # less activation memory, the standard TPU lever for bigger train batches
    remat: bool = False
    # compile the layer stack as ONE `lax.scan` over stacked block params
    # (YAML key ``SCAN_LAYERS``) instead of unrolling num_layers copies of the
    # block into the XLA program — XLA compiles the block body once, cutting
    # cold-compile time roughly by the layer count at these depths. Changes
    # the param tree layout: ``block_{i}/...`` -> ``blocks/...`` with a
    # leading (num_layers,) axis on every leaf (see `scan_utils.stack_block_params`)
    scan_layers: bool = False

    def replace(self, **kw) -> "T5Config":
        return dataclasses.replace(self, **kw)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (weight * x32).astype(self.dtype)


class T5FFN(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        dense = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        if cfg.feed_forward_proj == "gated-gelu":
            gate = jax.nn.gelu(dense(cfg.d_ff, "wi_0")(x), approximate=True)
            x = gate * dense(cfg.d_ff, "wi_1")(x)
        else:
            x = jax.nn.relu(dense(cfg.d_ff, "wi")(x))
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
        return dense(cfg.d_model, "wo")(x)


class T5Attention(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        mk = lambda feat, name: nn.Dense(
            feat, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        self.q = mk(inner, "q")
        self.k = mk(inner, "k")
        self.v = mk(inner, "v")
        self.o = mk(cfg.d_model, "o")

    def _split(self, x):  # (B, L, H*D) -> (B, H, L, D)
        b, l, _ = x.shape
        return x.reshape(b, l, self.cfg.num_heads, self.cfg.d_kv).transpose(0, 2, 1, 3)

    def _merge(self, x):  # (B, H, L, D) -> (B, L, H*D)
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(
        self,
        x: jnp.ndarray,
        kv_source: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        kv_source = x if kv_source is None else kv_source
        q = self._split(self.q(x))
        k = self._split(self.k(kv_source))
        v = self._split(self.v(kv_source))
        out = dot_product_attention(q, k, v, bias=bias, key_mask=key_mask, causal=causal)
        return self.o(self._merge(out))

    # -- incremental decode -------------------------------------------------

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project K/V once for a full sequence (cross-attn cache)."""
        return self._split(self.k(x)), self._split(self.v(x))

    def step(
        self,
        x: jnp.ndarray,  # (B, 1, D) current token hidden
        cache_k: jnp.ndarray,  # (B, H, T, d) — stale at `index`
        cache_v: jnp.ndarray,
        index: jnp.ndarray,  # scalar int32: current position
        bias_row: Optional[jnp.ndarray] = None,  # (1, H, 1, T)
        key_mask: Optional[jnp.ndarray] = None,  # (B, T) valid-position mask
    ):
        """One self-attention decode step WITHOUT touching the cache buffers.

        The current position's K/V contribution is folded in analytically
        (select at ``pos == index``) instead of a per-layer
        dynamic_update_slice — profiled on v5e, those per-layer cache DMAs
        were ~half the decode-loop time. The caller batches all layers' new
        K/V into ONE stacked cache write per step.
        Returns (attn_out, k_new, v_new)."""
        q = self._split(self.q(x))  # (B, H, 1, d)
        k_new = self._split(self.k(x))  # (B, H, 1, d)
        v_new = self._split(self.v(x))
        t = cache_k.shape[2]

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_k, preferred_element_type=jnp.float32
        )  # (B, H, 1, T) — stale at slot `index`
        logit_new = jnp.einsum(
            "bhqd,bhqd->bhq", q, k_new, preferred_element_type=jnp.float32
        )[..., None]  # (B, H, 1, 1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        logits = jnp.where(pos == index, logit_new, logits)
        if bias_row is not None:
            logits = logits + bias_row.astype(jnp.float32)
        keep = pos <= index
        if key_mask is not None:
            keep = keep & key_mask[:, None, None, :]
        logits = jnp.where(keep, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(cache_v.dtype)
        # past values from the cache with slot `index` zeroed, plus the new value
        at_index = (pos == index).astype(probs.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs * (1 - at_index), cache_v)
        p_idx = jnp.sum(probs * at_index, axis=3, keepdims=True)
        out = out + p_idx * v_new
        return self.o(self._merge(out)), k_new, v_new

    def cross_step(
        self,
        x: jnp.ndarray,  # (B, 1, D)
        cached_k: jnp.ndarray,  # (B, H, Lenc, d) — static
        cached_v: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,  # (B, Lenc)
    ):
        q = self._split(self.q(x))
        out = dot_product_attention(q, cached_k, cached_v, key_mask=key_mask)
        return self.o(self._merge(out))

    def step_k(
        self,
        x: jnp.ndarray,  # (B, K, D) — K consecutive tokens per row
        cache_k: jnp.ndarray,  # (B, H, T, d) — stale at >= per-row `pos`
        cache_v: jnp.ndarray,
        pos: jnp.ndarray,  # (B,) int32: per-row window start position
        bias_rows: Optional[jnp.ndarray] = None,  # (B, H, K, T)
    ):
        """K-token self-attention decode step (speculative verification).

        Generalizes `step` to a window of K tokens starting at a PER-ROW
        position: queries attend the cache strictly before their row's
        window plus a causal (K, K) in-window block computed analytically —
        no cache buffer is touched here (the caller scatters all layers'
        window K/V in one write, as the 1-token path does).
        Returns (attn_out (B, K, D), k_new, v_new (B, H, K, d))."""
        q = self._split(self.q(x))  # (B, H, K, d)
        k_new = self._split(self.k(x))
        v_new = self._split(self.v(x))
        b, h, kk, _ = q.shape
        t = cache_k.shape[2]

        logits_cache = jnp.einsum(
            "bhqd,bhkd->bhqk", q, cache_k, preferred_element_type=jnp.float32
        )  # (B, H, K, T)
        logits_win = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_new, preferred_element_type=jnp.float32
        )  # (B, H, K, K)
        if bias_rows is not None:
            logits_cache = logits_cache + bias_rows.astype(jnp.float32)
            # in-window bias: columns of bias_rows at the window's absolute
            # key positions pos+m — clamped at the buffer end (an OOB gather
            # fills NaN, and 0-prob × NaN would poison every query's output;
            # clamped columns belong to never-accepted window tails only)
            win_cols = pos[:, None, None, None] + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, kk), 3
            )  # (B, 1, 1, K)
            win_cols = jnp.minimum(win_cols, t - 1)
            win_bias = jnp.take_along_axis(
                bias_rows, jnp.broadcast_to(win_cols, (b, h, kk, kk)), axis=-1
            )
            logits_win = logits_win + win_bias.astype(jnp.float32)
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
        return self.o(self._merge(out)), k_new, v_new


class RelativeBias(nn.Module):
    cfg: T5Config
    bidirectional: bool = True

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jnp.ndarray:
        cfg = self.cfg
        ctx = jnp.arange(qlen)[:, None]
        mem = jnp.arange(klen)[None, :]
        buckets = relative_position_bucket(
            mem - ctx,
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        table = nn.Embed(
            cfg.relative_attention_num_buckets,
            cfg.num_heads,
            param_dtype=jnp.float32,
            name="rel_embedding",
        )
        return table(buckets).transpose(2, 0, 1)[None]  # (1, H, q, k)


class T5EncoderBlock(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.ln0 = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln0")
        self.attn = T5Attention(cfg, name="attn")
        self.ln1 = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln1")
        self.ffn = T5FFN(cfg, name="ffn")
        self.drop = nn.Dropout(cfg.dropout_rate, name="drop")

    def __call__(self, x, key_mask, bias, deterministic: bool = True):
        drop = self.drop
        x = x + drop(
            self.attn(self.ln0(x), key_mask=key_mask, bias=bias),
            deterministic=deterministic,
        )
        x = x + drop(self.ffn(self.ln1(x), deterministic=deterministic),
                     deterministic=deterministic)
        return x


class _ScanEncoderBlock(T5EncoderBlock):
    """`T5EncoderBlock` with the (carry, ys) signature `nn.scan` expects."""

    def __call__(self, x, key_mask, bias, deterministic: bool = True):
        return T5EncoderBlock.__call__(self, x, key_mask, bias, deterministic), None


class T5Encoder(nn.Module):
    """Encoder stack over pre-computed input embeddings.

    ``position_bias`` may be injected (SaL's 2D bias) — this is the
    TPU-native equivalent of the reference's `T52DStack`
    (`SaL_utils.py:296-501`); when None the standard T5 1D relative bias is
    computed internally.
    """

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.rel_bias = RelativeBias(cfg, bidirectional=True, name="rel_bias")
        if cfg.scan_layers:
            # one compiled block body, lax.scan over (num_layers,)-stacked
            # params; remat composes as scan-of-remat (prevent_cse=False —
            # the scan boundary already blocks CSE, keeping it on costs perf)
            base = _ScanEncoderBlock
            if cfg.remat:
                base = nn.remat(base, static_argnums=(4,), prevent_cse=False)
            self.blocks = nn.scan(
                base,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
            )(cfg, name="blocks")
        else:
            block_cls = (
                nn.remat(T5EncoderBlock, static_argnums=(4,))
                if cfg.remat
                else T5EncoderBlock
            )
            self.blocks = [
                block_cls(cfg, name=f"block_{i}") for i in range(cfg.num_layers)
            ]
        self.final_ln = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="final_ln")

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,  # (B, L, D)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, L) 1 = keep
        position_bias: Optional[jnp.ndarray] = None,  # (B|1, H, L, L)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        l = inputs_embeds.shape[1]
        bias = self.rel_bias(l, l) if position_bias is None else position_bias
        key_mask = None if attention_mask is None else attention_mask.astype(bool)
        x = inputs_embeds.astype(self.cfg.dtype)
        if self.cfg.scan_layers:
            x, _ = self.blocks(x, key_mask, bias, deterministic)
        else:
            for block in self.blocks:
                x = block(x, key_mask, bias, deterministic)
        return self.final_ln(x)


class T5DecoderBlock(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.ln0 = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln0")
        self.self_attn = T5Attention(cfg, name="self_attn")
        self.ln1 = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln1")
        self.cross_attn = T5Attention(cfg, name="cross_attn")
        self.ln2 = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln2")
        self.ffn = T5FFN(cfg, name="ffn")
        self.drop = nn.Dropout(cfg.dropout_rate, name="drop")

    def __call__(self, x, enc_out, enc_mask, self_mask, bias, deterministic=True):
        drop = self.drop
        x = x + drop(
            self.self_attn(self.ln0(x), key_mask=self_mask, bias=bias, causal=True),
            deterministic=deterministic,
        )
        x = x + drop(
            self.cross_attn(self.ln1(x), kv_source=enc_out, key_mask=enc_mask),
            deterministic=deterministic,
        )
        x = x + drop(self.ffn(self.ln2(x), deterministic=deterministic),
                     deterministic=deterministic)
        return x

    def step(self, x, cache_k, cache_v, cross_k, cross_v, index, bias_row,
             enc_mask, self_key_mask=None):
        h, k_new, v_new = self.self_attn.step(
            self.ln0(x), cache_k, cache_v, index, bias_row, self_key_mask
        )
        x = x + h
        x = x + self.cross_attn.cross_step(self.ln1(x), cross_k, cross_v, enc_mask)
        x = x + self.ffn(self.ln2(x))
        return x, k_new, v_new

    def step_k(self, x, cache_k, cache_v, cross_k, cross_v, pos, bias_rows,
               enc_mask):
        """K-token decode step at per-row positions (speculative decoding);
        cross_step is position-free so it serves the K-query window as-is."""
        h, k_new, v_new = self.self_attn.step_k(
            self.ln0(x), cache_k, cache_v, pos, bias_rows
        )
        x = x + h
        x = x + self.cross_attn.cross_step(self.ln1(x), cross_k, cross_v, enc_mask)
        x = x + self.ffn(self.ln2(x))
        return x, k_new, v_new


class _ScanDecoderBlock(T5DecoderBlock):
    """`T5DecoderBlock` with (carry, ys) signatures for each scanned method."""

    def __call__(self, x, enc_out, enc_mask, self_mask, bias, deterministic=True):
        return (
            T5DecoderBlock.__call__(
                self, x, enc_out, enc_mask, self_mask, bias, deterministic
            ),
            None,
        )

    def scan_step(self, x, cache_k, cache_v, cross_k, cross_v, index, bias_row,
                  enc_mask):
        x, k_new, v_new = T5DecoderBlock.step(
            self, x, cache_k, cache_v, cross_k, cross_v, index, bias_row, enc_mask
        )
        return x, (k_new, v_new)

    def scan_step_k(self, x, cache_k, cache_v, cross_k, cross_v, pos,
                    bias_rows, enc_mask):
        x, k_new, v_new = T5DecoderBlock.step_k(
            self, x, cache_k, cache_v, cross_k, cross_v, pos, bias_rows, enc_mask
        )
        return x, (k_new, v_new)

    def scan_project_kv(self, carry, enc_out):
        return carry, self.cross_attn.project_kv(enc_out)


class T5Decoder(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.rel_bias = RelativeBias(cfg, bidirectional=False, name="rel_bias")
        if cfg.scan_layers:
            base = _ScanDecoderBlock
            if cfg.remat:
                # remat only the train forward; the decode-step methods are
                # inference-only and inherit untransformed
                base = nn.remat(base, static_argnums=(6,), prevent_cse=False)
            axes = dict(variable_axes={"params": 0},
                        split_rngs={"params": True, "dropout": True},
                        length=cfg.num_decoder_layers)
            self.blocks = nn.scan(
                base,
                methods={
                    "__call__": dict(axes, in_axes=(nn.broadcast,) * 5),
                    "scan_step": dict(
                        axes,
                        in_axes=(0, 0, 0, 0, nn.broadcast, nn.broadcast,
                                 nn.broadcast),
                        out_axes=0,
                    ),
                    "scan_step_k": dict(
                        axes,
                        in_axes=(0, 0, 0, 0, nn.broadcast, nn.broadcast,
                                 nn.broadcast),
                        out_axes=0,
                    ),
                    "scan_project_kv": dict(
                        axes, in_axes=(nn.broadcast,), out_axes=0
                    ),
                },
            )(cfg, name="blocks")
        else:
            block_cls = (
                nn.remat(T5DecoderBlock, static_argnums=(6,))
                if cfg.remat
                else T5DecoderBlock
            )
            self.blocks = [
                block_cls(cfg, name=f"block_{i}")
                for i in range(cfg.num_decoder_layers)
            ]
        self.final_ln = RMSNorm(cfg.layer_norm_epsilon, cfg.dtype, name="final_ln")

    def __call__(
        self,
        dec_embeds: jnp.ndarray,  # (B, T, D)
        enc_out: jnp.ndarray,
        enc_mask: Optional[jnp.ndarray] = None,
        dec_mask: Optional[jnp.ndarray] = None,  # (B, T) 1 = real token
        deterministic: bool = True,
    ) -> jnp.ndarray:
        t = dec_embeds.shape[1]
        bias = self.rel_bias(t, t)
        enc_mask = None if enc_mask is None else enc_mask.astype(bool)
        dec_mask = None if dec_mask is None else dec_mask.astype(bool)
        x = dec_embeds.astype(self.cfg.dtype)
        if self.cfg.scan_layers:
            x, _ = self.blocks(x, enc_out, enc_mask, dec_mask, bias, deterministic)
        else:
            for block in self.blocks:
                x = block(x, enc_out, enc_mask, dec_mask, bias, deterministic)
        return self.final_ln(x)

    # -- incremental decode --------------------------------------------------

    def init_cache(self, enc_out: jnp.ndarray, max_len: int):
        """Allocate the STACKED self-attn cache (L, B, H, T, d) — one buffer
        per K/V for all layers, written with a single dynamic_update_slice
        per step — and precompute stacked cross-attn K/V + the full decoder
        relative bias table (sliced per step)."""
        cfg = self.cfg
        b = enc_out.shape[0]
        n_layers = cfg.num_decoder_layers
        if cfg.scan_layers:
            _, (ck, cv) = self.blocks.scan_project_kv((), enc_out)
        else:
            cks, cvs = [], []
            for block in self.blocks:
                k, v = block.cross_attn.project_kv(enc_out)
                cks.append(k)
                cvs.append(v)
            ck, cv = jnp.stack(cks), jnp.stack(cvs)
        cache = {
            "k": jnp.zeros(
                (n_layers, b, cfg.num_heads, max_len, cfg.d_kv), cfg.dtype
            ),
            "v": jnp.zeros(
                (n_layers, b, cfg.num_heads, max_len, cfg.d_kv), cfg.dtype
            ),
            "ck": ck,
            "cv": cv,
        }
        full_bias = self.rel_bias(max_len, max_len)  # (1, H, T, T)
        return cache, full_bias

    def step(
        self,
        tok_embed: jnp.ndarray,  # (B, 1, D)
        cache,
        index: jnp.ndarray,  # scalar
        full_bias: jnp.ndarray,  # (1, H, T, T)
        enc_mask: Optional[jnp.ndarray] = None,
    ):
        t = full_bias.shape[-1]
        bias_row = jax.lax.dynamic_slice(
            full_bias, (0, 0, index, 0), (1, full_bias.shape[1], 1, t)
        )
        enc_mask = None if enc_mask is None else enc_mask.astype(bool)
        x = tok_embed.astype(self.cfg.dtype)
        if self.cfg.scan_layers:
            x, (k_news, v_news) = self.blocks.scan_step(
                x, cache["k"], cache["v"], cache["ck"], cache["cv"],
                index, bias_row, enc_mask,
            )  # k/v_news: (L, B, H, 1, d), already stacked by the scan
        else:
            k_list, v_list = [], []
            for l, block in enumerate(self.blocks):
                x, k_new, v_new = block.step(
                    x, cache["k"][l], cache["v"][l], cache["ck"][l], cache["cv"][l],
                    index, bias_row, enc_mask,
                )
                k_list.append(k_new)
                v_list.append(v_new)
            k_news, v_news = jnp.stack(k_list), jnp.stack(v_list)
        # two stacked cache writes per step (instead of 2 per layer)
        new_k = jax.lax.dynamic_update_slice(
            cache["k"], k_news, (0, 0, 0, index, 0)
        )
        new_v = jax.lax.dynamic_update_slice(
            cache["v"], v_news, (0, 0, 0, index, 0)
        )
        cache = dict(cache, k=new_k, v=new_v)
        return self.final_ln(x), cache

    def step_k(
        self,
        tok_embeds: jnp.ndarray,  # (B, K, D)
        cache,
        pos: jnp.ndarray,  # (B,) int32: per-row window start
        full_bias: jnp.ndarray,  # (1, H, T, T)
        enc_mask: Optional[jnp.ndarray] = None,
    ):
        """K-token decode step at PER-ROW positions (speculative decoding).

        Rows advance at different rates during speculative decode, so the
        scalar `index` of `step` becomes a (B,) vector: the relative-bias
        rows are gathered per row and the window K/V are scattered into the
        stacked cache with a one-hot merge over the (small) time axis —
        still exactly two cache writes per step for all layers."""
        t = full_bias.shape[-1]
        kk = tok_embeds.shape[1]
        h = full_bias.shape[1]
        b = tok_embeds.shape[0]
        qpos = pos[:, None] + jnp.arange(kk, dtype=pos.dtype)[None, :]  # (B,K)
        qpos = jnp.minimum(qpos, t - 1)
        # bias_rows[b, :, j, :] = full_bias[0, :, pos_b + j, :]
        bias_rows = jnp.take(
            full_bias[0], qpos.reshape(-1), axis=1
        ).reshape(h, b, kk, t).transpose(1, 0, 2, 3)
        enc_mask = None if enc_mask is None else enc_mask.astype(bool)
        x = tok_embeds.astype(self.cfg.dtype)
        if self.cfg.scan_layers:
            x, (k_news, v_news) = self.blocks.scan_step_k(
                x, cache["k"], cache["v"], cache["ck"], cache["cv"],
                pos, bias_rows, enc_mask,
            )  # (L, B, H, K, d)
        else:
            k_list, v_list = [], []
            for l, block in enumerate(self.blocks):
                x, k_new, v_new = block.step_k(
                    x, cache["k"][l], cache["v"][l], cache["ck"][l],
                    cache["cv"][l], pos, bias_rows, enc_mask,
                )
                k_list.append(k_new)
                v_list.append(v_new)
            k_news, v_news = jnp.stack(k_list), jnp.stack(v_list)
        # scatter the window K/V at per-row positions: onehot[b, t, j]
        tpos = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
        onehot = (tpos == qpos[:, None, :]).astype(cache["k"].dtype)  # (B,T,K)
        in_window = jnp.minimum(onehot.sum(-1), 1.0)  # (B, T)
        keep_old = (1.0 - in_window)[None, :, None, :, None]
        new_k = cache["k"] * keep_old + jnp.einsum(
            "btj,lbhjd->lbhtd", onehot, k_news
        )
        new_v = cache["v"] * keep_old + jnp.einsum(
            "btj,lbhjd->lbhtd", onehot, v_news
        )
        cache = dict(cache, k=new_k, v=new_v)
        return self.final_ln(x), cache


class T5(nn.Module):
    """Full encoder-decoder with shared token embedding and LM head."""

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32, name="shared"
        )
        self.encoder = T5Encoder(cfg, name="encoder")
        self.decoder = T5Decoder(cfg, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size,
                use_bias=False,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                name="lm_head",
            )

    def __call__(self, inputs_embeds, dec_ids, enc_mask=None, dec_mask=None,
                 position_bias=None, deterministic: bool = True):
        """Teacher-forced encoder-decoder forward -> (B, T, V) f32 logits.
        (Also the init path that materializes the full parameter tree.)"""
        enc_out = self.encode(inputs_embeds, enc_mask, position_bias, deterministic)
        return self.decode(dec_ids, enc_out, enc_mask, dec_mask, deterministic)

    def embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.shared(ids).astype(self.cfg.dtype)

    def encode(self, inputs_embeds, attention_mask=None, position_bias=None,
               deterministic: bool = True):
        return self.encoder(inputs_embeds, attention_mask, position_bias, deterministic)

    def lm_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model**-0.5)
            logits = jnp.einsum(
                "btd,vd->btv",
                hidden,
                self.shared.embedding.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            )
        else:
            logits = self.lm_head(hidden).astype(jnp.float32)
        return logits

    def decode(self, dec_ids, enc_out, enc_mask=None, dec_mask=None,
               deterministic: bool = True):
        """Teacher-forced decode: returns (B, T, V) f32 logits."""
        hidden = self.decoder(
            self.embed(dec_ids), enc_out, enc_mask, dec_mask, deterministic
        )
        return self.lm_logits(hidden)

    def init_cache(self, enc_out, max_len: int):
        return self.decoder.init_cache(enc_out, max_len)

    def decode_step(self, token_ids, cache, index, full_bias, enc_mask=None):
        """One decode step: token_ids (B,) -> ((B, V) f32 logits, new cache)."""
        tok = self.embed(token_ids[:, None])
        hidden, cache = self.decoder.step(tok, cache, index, full_bias, enc_mask)
        return self.lm_logits(hidden)[:, 0], cache

    def decode_step_k(self, token_ids, cache, pos, full_bias, enc_mask=None):
        """K-token decode step at per-row positions (speculative decoding):
        token_ids (B, K) -> ((B, K, V) f32 logits, new cache)."""
        tok = self.embed(token_ids)
        hidden, cache = self.decoder.step_k(tok, cache, pos, full_bias, enc_mask)
        return self.lm_logits(hidden), cache
