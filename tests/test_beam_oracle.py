"""Beam-search oracle: our `beam_decode` vs HF `generate(num_beams=K,
length_penalty=0)` on imported weights (VERDICT r1 item 7).

The reference's shipped beam search is buggy (decodes from the greedy stream,
`/root/reference/core/model/CustomizedLaTr.py:227`), so the trusted oracle is
HF's beam search on the same weights. Semantic diff, by design (matching the
PhonoLaTr prototype `/root/reference/PhonoLaTr/ModelLaTr.py:260-388`):

* ours keeps K beams total and finished beams keep occupying their slot
  (emitting pad at no cost);
* HF retires finished hypotheses to a done-list and keeps exploring with
  2K candidates per step, so it can surface a continuation ours pruned.

Sequences therefore usually match but MAY legitimately differ; when they do,
the model-scored log-probability of our pick must be >= HF's pick (we never
return a worse sequence than the oracle's under our scoring rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoneme_vqa_tpu.decode.beam import _expand_to_beams, beam_decode
from phoneme_vqa_tpu.models.hf_import import import_t5_params
from phoneme_vqa_tpu.models.t5 import T5, T5Config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB, EOS, PAD = 41, 1, 0


def _models(seed: int):
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=PAD, eos_token_id=EOS,
    )
    torch.manual_seed(seed)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=True,
        dtype=jnp.float32,
    )
    model = T5(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32)), jnp.zeros((1, 2), jnp.int32)
    )["params"]
    params = import_t5_params(
        params, {k: v.numpy() for k, v in hf.state_dict().items()}, strict=True
    )
    return hf, model, params


def _seq_logprob(model, params, enc_ids, enc_mask, seq: np.ndarray) -> float:
    """Model-scored sum of token log-probs of ``seq`` (row of ids starting at
    the decoder-start token) up to and including the first EOS."""
    emb = model.apply({"params": params}, jnp.asarray(enc_ids[None]), method=T5.embed)
    logits = model.apply(
        {"params": params}, emb, jnp.asarray(seq[None, :-1]),
        jnp.asarray(enc_mask[None]), None,
    )
    logp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)[0]
    total, done = 0.0, False
    for t, tok in enumerate(seq[1:]):
        if done:
            break
        total += logp[t, int(tok)]
        done = tok == EOS
    return float(total)


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_matches_hf_or_scores_at_least_as_well(num_beams):
    hf, model, params = _models(seed=11)
    b, l_enc, max_len = 4, 7, 12
    rng = np.random.RandomState(17)
    enc_ids = rng.randint(2, VOCAB, (b, l_enc))
    enc_mask = np.ones((b, l_enc), np.int64)
    enc_mask[1, 5:] = 0

    with torch.no_grad():
        emb_t = hf.shared(torch.tensor(enc_ids))
        want = hf.generate(
            inputs_embeds=emb_t,
            attention_mask=torch.tensor(enc_mask),
            max_length=max_len,
            num_beams=num_beams,
            length_penalty=0.0,
            do_sample=False,
            early_stopping=False,
        ).numpy()

    emb = model.apply({"params": params}, jnp.asarray(enc_ids), method=T5.embed)
    enc_out = model.apply(
        {"params": params}, emb, jnp.asarray(enc_mask), method=T5.encode
    )
    cache, full_bias = model.apply(
        {"params": params}, enc_out, max_len, method=T5.init_cache
    )
    cache = _expand_to_beams(cache, num_beams)
    enc_mask_k = _expand_to_beams(jnp.asarray(enc_mask), num_beams)

    def step(tokens, cache, i):
        return model.apply(
            {"params": params}, tokens, cache, i, full_bias, enc_mask_k,
            method=T5.decode_step,
        )

    ours = np.asarray(
        jax.jit(
            lambda c: beam_decode(step, c, b, num_beams, max_len, 0, EOS, PAD)
        )(cache)
    )

    n_exact = 0
    for row in range(b):
        hf_row = want[row]
        our_row = ours[row]
        t_hf = hf_row.shape[0]
        if np.array_equal(our_row[:t_hf], hf_row) or _strip(our_row) == _strip(hf_row):
            n_exact += 1
            continue
        # legitimate semantic divergence: ours must score >= HF's pick
        s_ours = _seq_logprob(model, params, enc_ids[row], enc_mask[row], our_row)
        s_hf = _seq_logprob(
            model, params, enc_ids[row], enc_mask[row],
            np.concatenate([hf_row, np.full(max(0, max_len - t_hf), PAD)]),
        )
        assert s_ours >= s_hf - 1e-4, (
            f"row {row}: ours {our_row} ({s_ours:.4f}) scored below "
            f"HF {hf_row} ({s_hf:.4f})"
        )
    # the common case is exact agreement
    assert n_exact >= b - 1, f"only {n_exact}/{b} rows matched HF exactly"


def _strip(row) -> tuple:
    """Tokens after the decoder-start up to and including first EOS."""
    out = []
    for tok in row[1:]:
        out.append(int(tok))
        if tok == EOS:
            break
    return tuple(out)
