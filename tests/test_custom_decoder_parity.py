"""Numeric parity of `models/custom_decoder.py` against the torch modules it
re-designs: TokenEmbedding(x·sqrt d) + SinusoidalPositionalEncoding +
nn.TransformerDecoder(post-LN) + Linear lm head
(`/root/reference/core/model/modules/transformer_utils.py:6-64`,
`core/model/CustomizedLaTr.py:63-71,98-109`).

The comparison runs under CORRECT mask semantics on both sides (torch bool
key-padding masks, True = ignore). The reference's own executors feed int64
0/1 masks straight into `memory_key_padding_mask` / `tgt_key_padding_mask`
(`CustomizedLaTrDataset.py:52,57` -> `CustomizedLaTr.py:104-109`), which
torch either rejects or misreads (bool semantics are inverted; float masks
are additive) — a documented reference bug (README "Reference bugs fixed by
design"), so THAT path is not the parity target; the intended masked decode
is.

Also proves the KV-cached single-step decode (`CustomDecoder.step`, the
lax.while_loop body) emits the same tokens as torch's full-prefix re-decode
greedy loop (`CustomizedLaTr.py:146-184` semantics).
"""

import numpy as np
import pytest

from phoneme_vqa_tpu.models.custom_decoder import CustomDecoder, CustomDecoderConfig

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, T, LM, D, H, LAYERS, FF, V = 3, 7, 11, 32, 4, 2, 64, 53


class _TorchRef(torch.nn.Module):
    """The reference composite under correct mask semantics."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(3)
        self.emb = torch.nn.Embedding(V, D)
        layer = torch.nn.TransformerDecoderLayer(
            d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0,
            batch_first=True,
        )
        self.dec = torch.nn.TransformerDecoder(layer, num_layers=LAYERS)
        self.lm_head = torch.nn.Linear(D, V)
        pe = np.asarray(
            __import__(
                "phoneme_vqa_tpu.models.custom_decoder", fromlist=["sinusoidal_table"]
            ).sinusoidal_table(512, D)
        )
        self.register_buffer("pe", torch.tensor(pe))

    def decode(self, ids, memory, mem_keep, tgt_keep=None):
        x = self.emb(ids) * np.sqrt(D) + self.pe[: ids.shape[1]][None]
        causal = torch.nn.Transformer.generate_square_subsequent_mask(ids.shape[1])
        out = self.dec(
            x,
            memory,
            tgt_mask=causal,
            memory_key_padding_mask=~mem_keep,  # torch: True = IGNORE
            tgt_key_padding_mask=None if tgt_keep is None else ~tgt_keep,
        )
        return self.lm_head(out)


def _import_torch_decoder(params, ref):
    """torch state -> our flax param tree (in_proj packed qkv split 3-way)."""
    p = jax.tree.map(np.asarray, params)["params"]
    p["embed"]["embedding"] = ref.emb.weight.detach().numpy()
    p["lm_head"]["kernel"] = ref.lm_head.weight.detach().numpy().T
    p["lm_head"]["bias"] = ref.lm_head.bias.detach().numpy()
    for i, tl in enumerate(ref.dec.layers):
        dst = p[f"layer_{i}"]
        for src_attn, name in ((tl.self_attn, "self_attn"), (tl.multihead_attn, "cross_attn")):
            w = src_attn.in_proj_weight.detach().numpy()
            b = src_attn.in_proj_bias.detach().numpy()
            for j, proj in enumerate(("q", "k", "v")):
                dst[name][proj]["kernel"] = w[j * D : (j + 1) * D].T
                dst[name][proj]["bias"] = b[j * D : (j + 1) * D]
            dst[name]["out"]["kernel"] = src_attn.out_proj.weight.detach().numpy().T
            dst[name]["out"]["bias"] = src_attn.out_proj.bias.detach().numpy()
        dst["fc1"]["kernel"] = tl.linear1.weight.detach().numpy().T
        dst["fc1"]["bias"] = tl.linear1.bias.detach().numpy()
        dst["fc2"]["kernel"] = tl.linear2.weight.detach().numpy().T
        dst["fc2"]["bias"] = tl.linear2.bias.detach().numpy()
        for k, ln in (("ln1", tl.norm1), ("ln2", tl.norm2), ("ln3", tl.norm3)):
            dst[k]["scale"] = ln.weight.detach().numpy()
            dst[k]["bias"] = ln.bias.detach().numpy()
    return {"params": p}


@pytest.fixture(scope="module")
def pair():
    ref = _TorchRef().eval()
    cfg = CustomDecoderConfig(
        vocab_size=V, d_model=D, num_heads=H, num_layers=LAYERS, d_ff=FF,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    ours = CustomDecoder(cfg)
    rng = np.random.RandomState(0)
    memory = rng.randn(B, LM, D).astype(np.float32)
    ids = rng.randint(3, V, size=(B, T)).astype(np.int32)
    mem_keep = np.ones((B, LM), bool)
    mem_keep[0, 7:] = False
    mem_keep[2, 4:] = False
    tgt_keep = np.ones((B, T), bool)
    tgt_keep[1, 5:] = False
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(memory),
        jnp.asarray(mem_keep), jnp.asarray(tgt_keep),
    )
    params = _import_torch_decoder(params, ref)
    return ref, ours, params, memory, ids, mem_keep, tgt_keep


def test_teacher_forced_logits_match_torch(pair):
    ref, ours, params, memory, ids, mem_keep, tgt_keep = pair
    with torch.no_grad():
        want = ref.decode(
            torch.tensor(ids, dtype=torch.long), torch.tensor(memory),
            torch.tensor(mem_keep), torch.tensor(tgt_keep),
        ).numpy()
    got = np.asarray(
        ours.apply(
            params, jnp.asarray(ids), jnp.asarray(memory),
            jnp.asarray(mem_keep), jnp.asarray(tgt_keep),
        )
    )
    # rows masked out by tgt_keep attend to nothing on the torch side
    # (softmax over -inf -> nan-free garbage differs); compare valid rows
    keep = np.broadcast_to(tgt_keep[:, :, None], want.shape)
    np.testing.assert_allclose(got[keep], want[keep], rtol=2e-4, atol=2e-4)


def test_cached_step_decode_matches_torch_greedy(pair):
    """Our while-loop body (init_cache + step) == torch full re-decode greedy."""
    ref, ours, params, memory, ids, mem_keep, _ = pair
    del ids
    max_len, bos, eos = 9, 1, 2

    # --- torch greedy: full prefix re-decode per step (reference semantics) --
    ys = torch.full((B, 1), bos, dtype=torch.long)
    with torch.no_grad():
        for _ in range(max_len - 1):
            logits = ref.decode(
                ys, torch.tensor(memory), torch.tensor(mem_keep)
            )
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            ys = torch.cat([ys, nxt], dim=1)
    want = ys.numpy()

    # --- ours: one cache init + single-token steps -------------------------
    mem = jnp.asarray(memory)
    cache = ours.apply(params, mem, max_len, method=CustomDecoder.init_cache)
    tokens = jnp.full((B,), bos, jnp.int32)
    out = [np.full((B,), bos, np.int64)]
    for i in range(max_len - 1):
        logits, cache = ours.apply(
            params, tokens, cache, i, jnp.asarray(mem_keep),
            method=CustomDecoder.step,
        )
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out.append(np.asarray(tokens, np.int64))
    got = np.stack(out, axis=1)

    # compare up to each row's first EOS (post-EOS continuations are
    # unconstrained in the reference loop too)
    for b in range(B):
        w = want[b]
        stop = np.where(w == eos)[0]
        end = (stop[0] + 1) if len(stop) else max_len
        np.testing.assert_array_equal(got[b, :end], w[:end])


def test_step_k_matches_teacher_forced_forward():
    """The per-row-position window step (continuous batching) reproduces the
    teacher-forced forward exactly: K=1 steps and K=2 windows at staggered
    per-row positions tile the same causal attention."""
    rng = np.random.RandomState(7)
    cfg = CustomDecoderConfig(
        vocab_size=V, d_model=D, num_heads=H, num_layers=LAYERS, d_ff=FF,
        dtype=jnp.float32,
    )
    dec = CustomDecoder(cfg)
    memory = jnp.asarray(rng.standard_normal((B, 5, D)), jnp.float32)
    mem_keep = jnp.asarray(rng.rand(B, 5) > 0.2)
    ids = jnp.asarray(rng.randint(0, V, (B, T)), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), ids, memory)
    ref = np.asarray(dec.apply(params, ids, memory, mem_keep))

    for kk in (1, 2):
        cache = dec.apply(params, memory, T + 1, method=CustomDecoder.init_cache)
        pos = jnp.zeros((B,), jnp.int32)
        got = np.zeros_like(ref)
        for t in range(0, T - T % kk, kk):
            logits, cache = dec.apply(
                params, ids[:, t : t + kk], cache, pos, mem_keep,
                method=CustomDecoder.step_k,
            )
            got[:, t : t + kk] = np.asarray(logits)
            pos = pos + kk
        end = T - T % kk
        np.testing.assert_allclose(got[:, :end], ref[:, :end], atol=2e-4)


def test_phoneme_triple_step_k_matches_forward():
    """Same tiling property for the triple-head decoder (the continuous
    engine's phoneme decode path)."""
    from phoneme_vqa_tpu.models.phoneme import (
        PhonemeDecoderConfig,
        PhonemeTripleDecoder,
    )

    rng = np.random.RandomState(11)
    cfg = PhonemeDecoderConfig(
        onset_vocab=11, rhyme_vocab=13, tone_vocab=7, d_model=D, num_heads=H,
        num_layers=LAYERS, d_ff=FF, dtype=jnp.float32,
    )
    dec = PhonemeTripleDecoder(cfg)
    memory = jnp.asarray(rng.standard_normal((B, 5, D)), jnp.float32)
    mem_keep = jnp.asarray(rng.rand(B, 5) > 0.2)
    triples = jnp.stack(
        [
            jnp.asarray(rng.randint(0, v, (B, T)), jnp.int32)
            for v in (11, 13, 7)
        ],
        axis=-1,
    )
    params = dec.init(jax.random.PRNGKey(1), triples, memory)
    ref = [np.asarray(h) for h in dec.apply(params, triples, memory, mem_keep)]

    cache = dec.apply(params, memory, T + 1, method=PhonemeTripleDecoder.init_cache)
    pos = jnp.zeros((B,), jnp.int32)
    got = [np.zeros_like(r) for r in ref]
    for t in range(T):
        heads, cache = dec.apply(
            params, triples[:, t : t + 1], cache, pos, mem_keep,
            method=PhonemeTripleDecoder.step_k,
        )
        for c in range(3):
            got[c][:, t] = np.asarray(heads[c][:, 0])
        pos = pos + 1
    for c in range(3):
        np.testing.assert_allclose(got[c], ref[c], atol=2e-4)
