"""Joint triple-phoneme beam oracle: our `multi_head_beam_decode` vs the
EXECUTED PhonoLaTr prototype (`/root/reference/PhonoLaTr/ModelLaTr.py:260-388`)
on imported weights.

The prototype carries the only reference implementation of the novel joint
onset x rhyme x tone beam (outer-sum of the three head log-softmaxes, top-K
over the product space) — the semantics `decode/beam.py` cites as its spec.
This test CONSTRUCTS and RUNS that prototype offline (random-init HF
substitution, as `test_e2e_reference_parity.py` does) and asserts our beam's
winning sequence scores at least as high a joint log-prob as the prototype's
pick, under the prototype's own torch weights.

Execution repairs (the prototype cannot run as shipped; each is a shim, not a
semantic change, and is cited):

* ``from modules import VN_Embedding`` — `PhonoLaTr/modules.py` ships the
  class under its old name ``PhonemeEmbedding`` (same ctor signature);
  aliased before load.
* ``VN_Embedding(embedding_dim=d_model)`` (`ModelLaTr.py:83-87`) makes the
  concat 3*d_model wide — the decoder takes d_model, and the head split
  ``view(b, t, 3, d_model // 3)`` (`:139-140`) implies per-component dim
  d_model//3; the embedding is rebuilt at that width.
* ``decode`` is defined with 4 required args (`:153`) but called with 3 from
  both generate paths (`:228`, `:300`); the search slices raw decoder output
  while ``forward`` first applies ``special_lm_head`` (`:135` vs `:301-314`)
  — the same missing-projection defect as `core/model/PhonemeLaTr.py`. Both
  are repaired at the ``decode`` seam: a wrapper defaults the target mask,
  converts the 1/0 memory mask to the bool "True = ignore" form torch>=2
  requires, and applies the shared projection.
* the beam body's own comment says "Lấy token cuối cùng" (take the last
  token, `:306`) but the code never does — the heads see (B, T, d//3) and
  the outer-sum broadcast (`:317-322`) needs (B, V_c); the three lm heads
  are wrapped to apply at the final position, which is the only seam that
  realizes the comment without rewriting the search.
* ``_create_square_subsequent_mask`` hardcodes device="cuda" (`:405`);
  rebuilt on CPU, same values.
* the start triple is [bos, bos, bos] on BOTH sides (our aligned-specials
  convention; the prototype's [start, 0, 0] start is reproduced on our side
  via ``bos_triple`` when comparing — conditioning must match for the scores
  to be comparable).

The prototype search is additionally degenerate by construction (all K beams
initialized identically, so step 0's top-K collapses to K duplicates —
effectively a joint greedy): our beam must therefore match or beat it, never
lose to it.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.loader import batch_iterator
from phoneme_vqa_tpu.data.synthetic import (
    ANSWERS,
    QUESTIONS,
    make_latr_fixture,
    tiny_latr_yaml,
)
from phoneme_vqa_tpu.decode.beam import _expand_to_beams, multi_head_beam_decode
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .reference_loader import REFERENCE_ROOT, load_reference_module

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
    ),
]

D_MODEL = 48  # divisible by 3 (head split) and by n_head=4
MAXL = 12


def _load_prototype():
    mods = load_reference_module("PhonoLaTr/modules.py", "phonolatr_modules")
    if not hasattr(mods, "VN_Embedding"):
        mods.VN_Embedding = mods.PhonemeEmbedding  # ships under the old name
    sys.modules["modules"] = mods  # ModelLaTr.py does `from modules import …`
    try:
        proto = load_reference_module("PhonoLaTr/ModelLaTr.py", "phonolatr_model")
    finally:
        sys.modules.pop("modules", None)
    return mods, proto


def _build_prototype(tmp_path, tok, monkeypatch):
    from transformers import (
        T5Config as HFT5Config,
        T5EncoderModel,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    mods, proto = _load_prototype()
    vocab_path = str(tmp_path / "vocab.json")
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump(tok.vocab, f, ensure_ascii=False)
    # VN_Embedding's ctor hardcodes the relative path 'vocab.json'
    # (`ModelLaTr.py:84`)
    monkeypatch.chdir(tmp_path)

    t5_cfg = HFT5Config(
        vocab_size=512, d_model=D_MODEL, d_kv=12, num_heads=4, d_ff=96,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    vit_cfg = HFViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )

    class _T5EncF:
        @staticmethod
        def from_pretrained(name):
            return T5EncoderModel(t5_cfg)

    class _ViTF:
        @staticmethod
        def from_pretrained(name):
            return ViTModel(vit_cfg)

    old = (proto.T5EncoderModel, proto.ViTModel)
    proto.T5EncoderModel, proto.ViTModel = _T5EncF, _ViTF
    try:
        t5_cfg.max_2d_position_embeddings = 1024
        t5_cfg.vit_model = "unused-offline"
        t5_cfg.num_decoder_layers = 2
        t5_cfg.n_head = 4
        torch.manual_seed(47)
        ref = proto.CustomizedLaTr(t5_cfg, vocab_file=vocab_path).eval()
    finally:
        proto.T5EncoderModel, proto.ViTModel = old

    # repair: per-component embedding at d_model//3 so the concat is d_model
    torch.manual_seed(48)
    ref.tgt_tok_emb = mods.PhonemeEmbedding(
        vocab_path, embedding_dim=D_MODEL // 3, dropout_rate=0
    ).eval()

    # repair at the decode seam: default tgt mask, bool memory mask, shared
    # projection applied (forward does, the search paths do not)
    orig_decode = ref.decode

    def decode(tgt, memory, attention_mask, tgt_attention_mask=None):
        mask = attention_mask
        if mask is not None and mask.dtype != torch.bool:
            mask = mask == 0  # True = ignore
        return ref.special_lm_head(
            orig_decode(tgt, memory, mask, tgt_attention_mask)
        )

    ref.decode = decode

    # repair: CPU causal mask, same values as ModelLaTr.py:404-407
    def causal(sz, device="cpu"):
        m = (torch.triu(torch.ones((sz, sz))) == 1).transpose(0, 1)
        return m.float().masked_fill(m == 0, float("-inf")).masked_fill(
            m == 1, 0.0
        )

    ref._create_square_subsequent_mask = causal

    # repair: "Lấy token cuối cùng" (ModelLaTr.py:306) — the heads must see
    # the final position only for the outer-sum broadcast to line up
    raw_heads = {
        part: getattr(ref, f"{part}_lm_head")
        for part in ("onset", "rhyme", "tone")
    }

    class _LastPos(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x):
            return self.inner(x[:, -1] if x.dim() == 3 else x)

    for part, head in raw_heads.items():
        setattr(ref, f"{part}_lm_head", _LastPos(head))
    return ref, raw_heads


def _import_into_executor(ex, ref, raw_heads):
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )
    from tests.test_e2e_reference_parity import _import_torch_decoder_layers

    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    params["t5"] = import_t5_params(
        params["t5"],
        {k: v.numpy() for k, v in ref.encoder.state_dict().items()},
        report=report,
    )
    params["vit"] = import_vit_params(
        params["vit"],
        {k: v.numpy() for k, v in ref.vit.state_dict().items()},
        report=report,
    )
    assert not report.failed, report.failed
    sp = ref.spatial_feat_extractor
    params["spatial"]["tables"] = np.stack(
        [
            m.weight.detach().numpy()
            for m in (sp.top_left_x, sp.top_left_y, sp.bottom_right_x,
                      sp.bottom_right_y, sp.width_emb, sp.height_emb)
        ]
    ).astype(np.float32)
    params["visual_projector"]["kernel"] = (
        ref.visual_projector.weight.detach().numpy().T.astype(np.float32)
    )
    params["visual_projector"]["bias"] = (
        ref.visual_projector.bias.detach().numpy().astype(np.float32)
    )
    dec = params["decoder"]
    for part in ("onset", "rhyme", "tone"):
        dec[f"{part}_embed"]["embedding"] = (
            getattr(ref.tgt_tok_emb, f"{part}_embedding").weight.detach()
            .numpy().astype(np.float32)
        )
        head = raw_heads[part]
        dec[f"{part}_lm_head"]["kernel"] = (
            head.weight.detach().numpy().T.astype(np.float32)
        )
        dec[f"{part}_lm_head"]["bias"] = (
            head.bias.detach().numpy().astype(np.float32)
        )
    dec["shared_lm_head"]["kernel"] = (
        ref.special_lm_head.weight.detach().numpy().T.astype(np.float32)
    )
    dec["shared_lm_head"]["bias"] = (
        ref.special_lm_head.bias.detach().numpy().astype(np.float32)
    )
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()


def _proto_joint_logprob(ref, raw_heads, enc_out, mask, seq) -> float:
    """Joint log-prob of ``seq`` ((T, 3) int64, position 0 = start triple)
    under the prototype weights, teacher-forced, summed up to and including
    the first onset EOS.

    A sequence that never emits EOS (the prototype's buggy done flag stops
    the search as soon as EOS merely APPEARS in a candidate top-K,
    `ModelLaTr.py:353-355`, so its pick is usually an unterminated prefix)
    is scored as if terminated at the next step — EOS on the onset head plus
    the MOST generous (max) rhyme/tone log-probs. Sum-log-prob comparisons
    are only meaningful between complete answers of the model's own
    choosing; the generous completion means the gate can never pass by
    shortchanging the prototype's termination."""
    d3 = D_MODEL // 3
    with torch.no_grad():
        out = ref.decode(seq[None], enc_out, mask)  # projected (wrapper)
        out = out.view(1, -1, 3, d3)
        logps = [
            torch.log_softmax(
                raw_heads[part](out[:, :, c, :]).double(), -1
            )[0]
            for c, part in enumerate(("onset", "rhyme", "tone"))
        ]
    total, terminated = 0.0, False
    for t in range(seq.shape[0] - 1):
        for c in range(3):
            total += float(logps[c][t, int(seq[t + 1, c])])
        if int(seq[t + 1, 0]) == 4:  # EOS_ID
            terminated = True
            break
    if not terminated:
        last = seq.shape[0] - 1
        total += float(logps[0][last, 4])  # forced EOS on the onset head
        total += float(logps[1][last].max()) + float(logps[2][last].max())
    return total


@pytest.mark.parametrize("num_beams", [2, 4])
def test_joint_beam_scores_at_least_the_executed_prototype(
    tmp_path, monkeypatch, num_beams
):
    import jax.numpy as jnp

    paths = make_latr_fixture(tmp_path)
    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    ann_path = str(tmp_path / "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f, ensure_ascii=False)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=MAXL,
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        d_model=D_MODEL, d_kv=12, d_ff=96,
        num_decoder_layers=2, n_head=4, NUM_FREEZE_EPOCH=0,
        isgreedy=False, num_beam=num_beams, max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer
    assert tok.eos_id == 4  # _proto_joint_logprob hardcodes the aligned id

    ref, raw_heads = _build_prototype(tmp_path, tok, monkeypatch)
    _import_into_executor(ex, ref, raw_heads)
    params = ex._inference_params()
    model = ex.model

    batch, _ = next(batch_iterator(ex.val_data, len(ex.val_data)))
    model_batch = {k: jnp.asarray(v) for k, v in ex._model_batch(batch).items()}
    b = len(ex.val_data)
    start = (tok.bos_id, 0, 0)  # the prototype's start triple (`:287`)

    # --- the executed prototype beam, one row at a time (its candidate
    # re-binning is only coherent at bz=1) ------------------------------------
    tt = lambda k, dt: torch.tensor(np.asarray(batch[k])).to(dt)
    with torch.no_grad():
        emb, mask = ref._calculate_embedding(
            tt("pixel_values", torch.float32),
            tt("coordinates", torch.long),
            tt("input_ids", torch.long),
            tt("ocr_attention_mask", torch.long),
            tt("src_attention_mask", torch.long),
            tt("tokenized_ocr", torch.long),
        )
        enc_out_all = ref.encoder(
            attention_mask=mask, inputs_embeds=emb
        ).last_hidden_state
    proto_seqs = []
    for row in range(b):
        with torch.no_grad():
            proto_seqs.append(ref.beam_generate(
                tt("pixel_values", torch.float32)[row : row + 1],
                tt("coordinates", torch.long)[row : row + 1],
                tt("input_ids", torch.long)[row : row + 1],
                tt("src_attention_mask", torch.long)[row : row + 1],
                tt("ocr_attention_mask", torch.long)[row : row + 1],
                tt("tokenized_ocr", torch.long)[row : row + 1],
                start_symbol=tok.bos_id,
                end_symbol=tok.eos_id,
                max_len=MAXL - 1,
                num_beam=num_beams,
            )[0])

    # --- our joint beam at the SAME horizon as each prototype pick ----------
    # The prototype's done flag fires as soon as EOS merely APPEARS in a
    # candidate top-K (`ModelLaTr.py:353-355`), so its picks are short
    # unterminated prefixes of varying length. Sum-log-prob comparisons are
    # only meaningful at equal emission counts, so our beam is re-run with
    # max_length = the prototype pick's length, per distinct length.
    def make_run(maxl):
        def run(mb):
            cache, full_bias, enc_mask = model.apply(
                {"params": params}, mb, maxl,
                method=type(model).encode_for_generate,
            )
            cache = _expand_to_beams(cache, num_beams)
            mask_k = _expand_to_beams(enc_mask, num_beams)

            def step(tokens, cache, i):
                return model.apply(
                    {"params": params}, tokens, cache, i, full_bias, mask_k,
                    method=type(model).decode_step,
                )

            return multi_head_beam_decode(
                step, cache, b, num_beams, maxl, tok.bos_id, tok.eos_id,
                tok.pad_id, stop_component=0, bos_triple=start,
            )
        return run

    ours_by_len = {}
    for L in sorted({int(s.shape[0]) for s in proto_seqs} | {2}):
        ours_by_len[L] = np.asarray(jax.jit(make_run(max(L, 2)))(model_batch))

    # --- exact one-step anchor: at horizon 1 both searches MUST return the
    # argmax of the joint onset x rhyme x tone distribution — our top-K-per-
    # component K^3 cube is exact for the top-K of a sum of independent
    # terms, and the prototype materializes the full product space ---------
    for row in range(b):
        with torch.no_grad():
            proto_one = ref.beam_generate(
                tt("pixel_values", torch.float32)[row : row + 1],
                tt("coordinates", torch.long)[row : row + 1],
                tt("input_ids", torch.long)[row : row + 1],
                tt("src_attention_mask", torch.long)[row : row + 1],
                tt("ocr_attention_mask", torch.long)[row : row + 1],
                tt("tokenized_ocr", torch.long)[row : row + 1],
                start_symbol=tok.bos_id,
                end_symbol=tok.eos_id,
                max_len=1,
                num_beam=num_beams,
            )[0]
        np.testing.assert_array_equal(
            ours_by_len[2][row, 1], np.asarray(proto_one[1]),
            err_msg=f"row {row}: first joint pick differs from the prototype",
        )

    # --- full-horizon exact anchor at K=1: the prototype's K identical
    # init beams collapse its search to PURE JOINT GREEDY (step 0's sorted
    # candidate list is K duplicates of the argmax, and so on every step),
    # and the joint argmax of a sum of independent component scores is the
    # componentwise argmax — so our K=1 multi-head beam must reproduce the
    # prototype's emitted trace TOKEN FOR TOKEN up to the prototype's
    # (early) stop. This anchors the joint semantics over many steps. ------
    ours_k1_by_len = {}
    for row in range(b):
        with torch.no_grad():
            proto_g = ref.beam_generate(
                tt("pixel_values", torch.float32)[row : row + 1],
                tt("coordinates", torch.long)[row : row + 1],
                tt("input_ids", torch.long)[row : row + 1],
                tt("src_attention_mask", torch.long)[row : row + 1],
                tt("ocr_attention_mask", torch.long)[row : row + 1],
                tt("tokenized_ocr", torch.long)[row : row + 1],
                start_symbol=tok.bos_id, end_symbol=tok.eos_id,
                max_len=MAXL - 1, num_beam=1,
            )[0]
        L = int(proto_g.shape[0])
        if L not in ours_k1_by_len:
            import functools as _ft

            def run_k1(mb, maxl):
                cache, full_bias, enc_mask = model.apply(
                    {"params": params}, mb, maxl,
                    method=type(model).encode_for_generate,
                )
                def step(tokens, cache, i):
                    return model.apply(
                        {"params": params}, tokens, cache, i, full_bias,
                        enc_mask, method=type(model).decode_step,
                    )
                return multi_head_beam_decode(
                    step, cache, b, 1, maxl, tok.bos_id, tok.eos_id,
                    tok.pad_id, stop_component=0, bos_triple=start,
                )
            ours_k1_by_len[L] = np.asarray(
                jax.jit(_ft.partial(run_k1, maxl=max(L, 2)))(model_batch)
            )
        np.testing.assert_array_equal(
            ours_k1_by_len[L][row], np.asarray(proto_g),
            err_msg=f"row {row}: K=1 trace differs from the executed "
                    "prototype's joint-greedy trace",
        )

    # --- K>1 score comparison at equal horizons: informative, loosely
    # gated. At random init every step costs ~log(V) nats, so beam-vs-
    # greedy pruning decisions are coin flips with large magnitudes — a
    # correct K-beam can legitimately lose individual rows (the greedy path
    # gets pruned when K prefixes outscore it mid-way), which is why the
    # hard anchors above are exact-equality properties instead. The
    # aggregate bound only catches gross search regressions. ---------------
    total_ours, total_proto = 0.0, 0.0
    for row in range(b):
        proto_seq = proto_seqs[row]
        L = int(proto_seq.shape[0])
        our_row = ours_by_len[L][row]
        enc_row = enc_out_all[row : row + 1]
        mask_row = mask[row : row + 1]
        total_proto += _proto_joint_logprob(
            ref, raw_heads, enc_row, mask_row, proto_seq.long()
        )
        total_ours += _proto_joint_logprob(
            ref, raw_heads, enc_row, mask_row,
            torch.tensor(our_row, dtype=torch.long),
        )
    assert total_ours >= total_proto - 0.15 * abs(total_proto), (
        f"our K={num_beams} beam lost grossly to the executed prototype in "
        f"aggregate: {total_ours:.4f} vs {total_proto:.4f}"
    )
