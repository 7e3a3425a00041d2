"""Standalone phoneme-predictor demo (JAX).

Equivalent of the reference's `decode/multi_token.py` MultiTokensPredictor +
`decode/excute.py` CLI (`/root/reference/decode/multi_token.py:38-126`): a
transformer ENCODER over per-word phoneme-component embeddings with an
independent log-softmax head per component (onset / rhyme / tone).

Run:  python examples/phoneme_predictor.py --sentence "xin chào việt nam" \
          [--vocab-file phoneme_vocab.json]
With no trained weights this demos the forward path on random init and
prints the per-token argmax components.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from phoneme_vqa_tpu.models.custom_decoder import sinusoidal_table
from phoneme_vqa_tpu.ops.attention import dot_product_attention
from phoneme_vqa_tpu.phonology.analyze import is_vietnamese_3
from phoneme_vqa_tpu.phonology.vocab import VocabBuilder


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int = 8
    d_ff: int = 2048

    @nn.compact
    def __call__(self, x):
        h = self.d_model // self.num_heads

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.num_heads, h).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.d_model, name="q")(x))
        k = split(nn.Dense(self.d_model, name="k")(x))
        v = split(nn.Dense(self.d_model, name="v")(x))
        a = dot_product_attention(q, k, v, scale=h**-0.5)
        b, nh, l, hd = a.shape
        a = nn.Dense(self.d_model, name="o")(a.transpose(0, 2, 1, 3).reshape(b, l, -1))
        x = nn.LayerNorm(name="ln1")(x + a)
        f = nn.Dense(self.d_model, name="fc2")(
            jax.nn.relu(nn.Dense(self.d_ff, name="fc1")(x))
        )
        return nn.LayerNorm(name="ln2")(x + f)


class MultiTokensPredictor(nn.Module):
    """Per-token (onset, rhyme, tone) predictor over phoneme embeddings."""

    vocab: dict  # {'onset': {...}, 'rhyme': {...}, 'tone': {...}}
    d_model: int = 384
    embed_dim: int = 128
    num_layers: int = 6

    @nn.compact
    def __call__(self, triples: jnp.ndarray):  # (B, T, 3) int32
        emb = lambda part, name: nn.Embed(
            len(self.vocab[part]), self.embed_dim, name=name
        )
        x = jnp.concatenate(
            [
                emb("onset", "onset_embed")(triples[..., 0]),
                emb("rhyme", "rhyme_embed")(triples[..., 1]),
                emb("tone", "tone_embed")(triples[..., 2]),
            ],
            axis=-1,
        )
        x = x + jnp.asarray(sinusoidal_table(512, x.shape[-1]))[None, : x.shape[1]]
        for i in range(self.num_layers):
            x = EncoderLayer(x.shape[-1], name=f"layer_{i}")(x)
        heads = {}
        for part in ("onset", "rhyme", "tone"):
            h = nn.LayerNorm(name=f"{part}_ln")(x)
            h = nn.Dense(len(self.vocab[part]), name=f"{part}_head")(h)
            heads[part] = jax.nn.log_softmax(h, axis=-1)
        return heads


def encode_sentence(vocab, sentence: str) -> np.ndarray:
    triples = []
    for word in sentence.lower().split():
        ok, (onset, rhyme, tone) = is_vietnamese_3(word)
        if ok:
            triples.append(
                (
                    vocab["onset"].get(onset or "none", 0),
                    vocab["rhyme"].get(rhyme or "none", 0),
                    vocab["tone"].get(tone or "none", 0),
                )
            )
        else:
            for ch in word:
                triples.append((vocab["onset"].get(ch, 0), 0, 0))
    return np.asarray([triples], np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sentence", default="xin chào việt nam")
    parser.add_argument("--vocab-file", default=None)
    parser.add_argument("--model-dim", type=int, default=384)
    args = parser.parse_args()

    if args.vocab_file and os.path.isfile(args.vocab_file):
        vocab = json.load(open(args.vocab_file, encoding="utf-8"))
    else:
        builder = VocabBuilder([])
        builder.add_text(args.sentence)
        vocab = builder.vocab

    model = MultiTokensPredictor(vocab, d_model=args.model_dim)
    triples = encode_sentence(vocab, args.sentence)
    params = model.init(jax.random.PRNGKey(0), triples)
    heads = model.apply(params, triples)

    inv = {p: {i: t for t, i in vocab[p].items()} for p in vocab}
    for i in range(triples.shape[1]):
        parts = {
            p: inv[p][int(jnp.argmax(heads[p][0, i]))] for p in ("onset", "rhyme", "tone")
        }
        print(f"Token {i + 1}: onset: {parts['onset']}, rhyme: {parts['rhyme']}, "
              f"tone: {parts['tone']}")


if __name__ == "__main__":
    main()
