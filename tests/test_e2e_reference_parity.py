"""END-TO-END north-star gate (BASELINE.md): identical answer strings between
the REFERENCE's own model pipeline and this framework's production executor,
on the same data and the same (imported) weights.

The reference LaTr (`/root/reference/core/model/LaTr.py`) is constructed
offline by substituting its `from_pretrained` calls with same-config
random-init HF modules; its weights are then imported into our executor via
`models/hf_import.py` (+ the spatial tables / visual projector, mapped here).
Our `BaseExecutor.infer` — the exact path `run.py --mode eval` drives — must
produce the same answer strings the reference model's decode produces.

Dataset featurization equality is covered separately (`test_data_parity.py`);
here both sides consume the same featurized arrays so the gate isolates
model + decode + detokenization.

Note the reference's shipped `LaTr.generate` drops the encoder attention mask
(`LaTr.py:110` — `backbone.generate` without `attention_mask`), silently
attending to OCR padding; the intended masked path is reconstructed here from
its own `calculate_embedding` (README "Reference bugs fixed by design").
"""

import os

import jax
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.loader import batch_iterator
from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .reference_loader import REFERENCE_ROOT, load_reference_package

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
    ),
]


def _reference_model():
    from transformers import (
        T5Config as HFT5Config,
        T5ForConditionalGeneration,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    t5_cfg = HFT5Config(
        vocab_size=512, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    vit_cfg = HFViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ref_latr = load_reference_package("core.model.LaTr")

    class _T5Factory:
        @staticmethod
        def from_pretrained(name):
            return T5ForConditionalGeneration(t5_cfg)

    class _ViTFactory:
        @staticmethod
        def from_pretrained(name):
            return ViTModel(vit_cfg)

    old = (ref_latr.T5ForConditionalGeneration, ref_latr.ViTModel)
    ref_latr.T5ForConditionalGeneration = _T5Factory
    ref_latr.ViTModel = _ViTFactory
    try:
        # the SpatialModule reads these off the passed config object
        t5_cfg.max_2d_position_embeddings = 1024
        t5_cfg.vit_model = "unused-offline"
        torch.manual_seed(42)
        model = ref_latr.LaTr(t5_cfg).eval()
    finally:
        ref_latr.T5ForConditionalGeneration, ref_latr.ViTModel = old
    return model


def _import_reference_weights(ex, ref):
    """Map every reference tensor into the executor's param tree."""
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    t5_sd = {k: v.numpy() for k, v in ref.backbone.state_dict().items()}
    params["t5"] = import_t5_params(params["t5"], t5_sd, report=report)
    vit_sd = {k: v.numpy() for k, v in ref.vit.state_dict().items()}
    params["vit"] = import_vit_params(params["vit"], vit_sd, report=report)
    assert not report.failed, report.failed

    sp = ref.spatial_feat_extractor
    tables = np.stack(
        [
            m.weight.detach().numpy()
            for m in (sp.top_left_x, sp.top_left_y, sp.bottom_right_x,
                      sp.bottom_right_y, sp.width_emb, sp.height_emb)
        ]
    )
    assert params["spatial"]["tables"].shape == tables.shape
    params["spatial"]["tables"] = tables.astype(np.float32)
    params["visual_projector"]["kernel"] = (
        ref.visual_projector.weight.detach().numpy().T.astype(np.float32)
    )
    params["visual_projector"]["bias"] = (
        ref.visual_projector.bias.detach().numpy().astype(np.float32)
    )
    ex.state = ex.state.replace(params=params)
    ex._place_state()


def test_identical_answer_strings_end_to_end(tmp_path):
    max_len = 10
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ref = _reference_model()
    _import_reference_weights(ex, ref)

    # --- our production path: the executor's jitted infer -----------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: its own fusion + HF generate on the same arrays --
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref.calculate_embedding(
                torch.tensor(batch["pixel_values"]),
                torch.tensor(batch["coordinates"], dtype=torch.long),
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["ocr_attention_mask"], dtype=torch.long),
                torch.tensor(batch["src_attention_mask"], dtype=torch.long),
                torch.tensor(batch["tokenized_ocr"], dtype=torch.long),
            )
            out = ref.backbone.generate(
                inputs_embeds=emb,
                attention_mask=mask.long(),
                max_length=max_len,
                do_sample=False,
                num_beams=1,
            )
        ref_rows.extend(np.asarray(out)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)

    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6

    # BASELINE.md's correctness baseline, end to end: the reference's OWN
    # compute_scores on its own generations must equal our compute_scores on
    # ours — identical strings through two independent metric stacks
    from phoneme_vqa_tpu.evaluation import compute_scores

    gts = {i: [a] for i, a in enumerate(ex.val_answer)}
    our_score, _ = compute_scores(gts, {i: [g] for i, g in enumerate(ours)})
    ref_eval = load_reference_package("evaluation")
    ref_score, _ = ref_eval.compute_scores(
        gts, {i: [g] for i, g in enumerate(theirs)}
    )
    for k in ("Accuracy", "F1", "CIDEr", "ROUGE"):
        assert float(our_score[k]) == pytest.approx(float(ref_score[k]), abs=1e-12)
    assert [float(x) for x in our_score["BLEU"]] == pytest.approx(
        [float(x) for x in ref_score["BLEU"]], abs=1e-12
    )


def _import_torch_decoder_layers(dec_params, torch_layers):
    """torch nn.TransformerDecoder layers -> our CustomDecoder layer params,
    via the production state-dict importer (models/hf_import.py)."""
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_torch_decoder_layers,
    )

    sd = {
        f"layers.{i}.{k}": v.detach().numpy()
        for i, tl in enumerate(torch_layers)
        for k, v in tl.state_dict().items()
    }
    rep = ImportReport()
    import_torch_decoder_layers(dec_params, sd, "layers", rep)
    assert not rep.failed, rep.failed


def test_sal_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for the SaL family — the hardest one: three feature streams
    (question / OCR-with-det⊕rec-features / OBJ-with-region-features), RMS-
    normed projections, and the injected 2D position bias (1D sequence + SCP
    grid on the OCR block). The reference model (`/root/reference/core/model/
    SaL.py`) is built offline by substituting its `from_pretrained` with a
    same-config random-init `T52dForConditionalGeneration` and its bias
    modules with CPU-device instances.

    The reference's shipped `generate` drops the attention mask AND its
    encoder never folds the mask into the injected bias (HF skips mask
    addition when `position_bias` is supplied) — the intended masked path is
    reconstructed here by pre-adding the extended mask to the bias, matching
    the divergence documented in `models/rel_bias_2d.py`.
    """
    import functools

    from transformers import T5Config as HFT5Config

    from phoneme_vqa_tpu.data.synthetic import make_sal_fixture, tiny_sal_yaml
    from phoneme_vqa_tpu.models.hf_import import ImportReport, import_t5_params

    max_len = 10
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")

    ref_mod = load_reference_package("core.model.SaL")
    sal_utils = load_reference_package("core.model.modules.SaL_utils")

    t5_cfg = HFT5Config(
        vocab_size=512, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    # attributes SaL.__init__ reads off its config (SaL.py:28-43)
    t5_cfg.new_token_embedding_size = 512  # fallback tokenizer: no <c> resize
    t5_cfg.ocr_hidden = config.ocr_hidden
    t5_cfg.obj_hidden = config.obj_hidden

    class _T52dF:
        @staticmethod
        def from_pretrained(name):
            return sal_utils.T52dForConditionalGeneration(t5_cfg)

    old = (
        ref_mod.T52dForConditionalGeneration,
        ref_mod.RelativePositionBias1D,
        ref_mod.SCPRelativePositionBias,
    )
    ref_mod.T52dForConditionalGeneration = _T52dF
    ref_mod.RelativePositionBias1D = functools.partial(
        sal_utils.RelativePositionBias1D, device="cpu"
    )
    ref_mod.SCPRelativePositionBias = functools.partial(
        sal_utils.SCPRelativePositionBias, device="cpu"
    )
    try:
        torch.manual_seed(13)
        ref = ref_mod.SaL(t5_cfg, obj_dropout=0.0, ocr_dropout=0.0).eval()
    finally:
        (
            ref_mod.T52dForConditionalGeneration,
            ref_mod.RelativePositionBias1D,
            ref_mod.SCPRelativePositionBias,
        ) = old

    # --- weight import: backbone via the T5 mapper, the SaL extras by hand --
    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    sd = {k: v.numpy() for k, v in ref.backbone.state_dict().items()}
    # the fork keeps T5Stack's own encoder rel-bias table but never evaluates
    # it (the injected 2D bias replaces it, SaL_utils.py:437); our encoder
    # likewise never materializes one, so the tensor has no destination
    unused = "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    sd.pop(unused)
    params["t5"] = import_t5_params(params["t5"], sd, report=report)
    assert not report.failed, report.failed
    params["rel2d"]["rel1d"]["embedding"] = (
        ref.rel2Dbias.Relative1D.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    params["rel2d"]["scp"]["embedding"] = (
        ref.rel2Dbias.SCP.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    for stream in ("ocr", "obj"):
        proj = getattr(ref, f"{stream}_feature_projector")
        bbox = getattr(ref, f"{stream}_bbox_projector")
        norm = getattr(ref, f"{stream}_feature_layer_norm")
        params[f"{stream}_feature_projector"]["kernel"] = (
            proj.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_feature_projector"]["bias"] = (
            proj.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["kernel"] = (
            bbox.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["bias"] = (
            bbox.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_norm"]["weight"] = (
            norm.weight.detach().numpy().astype(np.float32)
        )
    ex.state = ex.state.replace(params=params)
    ex._place_state()

    # --- our production path ------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: its own fusion + 2D bias + HF generate -------------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        tt = lambda k, dt: torch.tensor(np.asarray(batch[k])).to(dt)
        with torch.no_grad():
            obj_emb = ref.calculate_obj_embedding(
                tt("tokenized_obj", torch.long),
                tt("obj_coordinates", torch.float32),
                tt("obj_features", torch.float32),
            )
            ocr_emb = ref.calculate_ocr_embedding(
                tt("tokenized_ocr", torch.long),
                tt("ocr_coordinates", torch.float32),
                tt("ocr_features", torch.float32),
            )
            ques_emb = ref.backbone.shared(tt("input_ids", torch.long))
            emb = torch.cat([ques_emb, ocr_emb, obj_emb], dim=1)
            mask = torch.cat(
                [
                    tt("src_attention_mask", torch.long),
                    tt("ocr_attention_mask", torch.long),
                    tt("obj_attention_mask", torch.long),
                ],
                dim=1,
            )
            bias = ref.rel2Dbias(
                emb, mask, tt("ocr_coordinates", torch.float32),
                config.max_q_length, config.max_ocr_length,
            )
            # the intended masked path (see docstring): fold the key padding
            # mask into the injected bias the way HF does for its own bias
            ext = (1.0 - mask.to(torch.float32)) * torch.finfo(torch.float32).min
            bias = bias + ext[:, None, None, :]
            out = ref.backbone.generate(
                inputs_embeds=emb,
                attention_mask=mask,
                position_bias=bias,
                max_length=max_len,
                do_sample=False,
                num_beams=1,
            )
        ref_rows.extend(np.asarray(out)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_customized_latr_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for CustomizedLaTr (`/root/reference/core/model/
    CustomizedLaTr.py:45-184`): frozen-ViT T5 *encoder-only* backbone with
    the LaTr spatial fusion, then the custom decoder (scaled TokenEmbedding +
    sinusoidal PE + nn.TransformerDecoder + lm head) over a pluggable answer
    tokenizer (ByteTokenizer here), greedy full-re-decode loop.

    The reference feeds its int64 0/1 attention mask to
    `memory_key_padding_mask` (`CustomizedLaTr.py:104-109`), which torch>=2
    rejects — the intended bool "True = ignore" mask is passed here (README
    "Reference bugs fixed by design")."""
    from transformers import (
        T5Config as HFT5Config,
        T5EncoderModel,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    max_len = 12
    d_model = 32
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer

    ref_mod = load_reference_package("core.model.CustomizedLaTr")
    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
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

    old = (ref_mod.T5EncoderModel, ref_mod.ViTModel)
    ref_mod.T5EncoderModel, ref_mod.ViTModel = _T5EncF, _ViTF
    try:
        t5_cfg.max_2d_position_embeddings = 1024
        t5_cfg.vit_model = "unused-offline"
        t5_cfg.num_decoder_layers = 2
        t5_cfg.n_head = 4
        torch.manual_seed(23)
        ref = ref_mod.CustomizedLaTr(t5_cfg, tgt_vocab_size=len(tok)).eval()
    finally:
        ref_mod.T5EncoderModel, ref_mod.ViTModel = old

    # --- weight import -------------------------------------------------------
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
    # reference TokenEmbedding is sqrt(d)-scaled like ours: import directly
    dec["embed"]["embedding"] = (
        ref.tgt_tok_emb.embedding.weight.detach().numpy().astype(np.float32)
    )
    dec["lm_head"]["kernel"] = ref.lm_head.weight.detach().numpy().T.astype(np.float32)
    dec["lm_head"]["bias"] = ref.lm_head.bias.detach().numpy().astype(np.float32)
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: fusion + encoder + greedy full re-decode ------------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref._calculate_embedding(
                torch.tensor(np.asarray(batch["pixel_values"])),
                torch.tensor(np.asarray(batch["coordinates"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["input_ids"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["ocr_attention_mask"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["src_attention_mask"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["tokenized_ocr"]), dtype=torch.long),
            )
            enc_out = ref.encoder(
                attention_mask=mask, inputs_embeds=emb
            ).last_hidden_state
            bz = emb.shape[0]
            ys = torch.full((bz, 1), tok.bos_id, dtype=torch.long)
            for _ in range(max_len - 1):
                out = ref.decode(ys, enc_out, mask == 0)  # bool: True = ignore
                nxt = torch.argmax(ref.lm_head(out[:, -1]), dim=-1)
                ys = torch.cat([ys, nxt.view(bz, 1)], dim=1)
                if (ys == tok.eos_id).any(dim=1).sum() == bz:
                    break
        ref_rows.extend(np.asarray(ys)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_phoneme_sal_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for PhonemeSaL — the one phoneme-family pipeline whose
    reference decode actually runs (`/root/reference/core/model/
    PhonemeSaL.py:135-192`): SaL fusion + injected 2D bias encoder, flat
    phoneme stream through an (unscaled) embedding + sinusoidal PE +
    nn.TransformerDecoder, greedy with a per-row break_signal latch, and
    `compose_word` detokenization back to diacritic-correct text.

    Reconstructed intended-mask semantics (documented divergences):
    * the injected encoder bias never receives the padding mask in the
      reference (HF skips mask-addition for supplied bias) — pre-added here;
    * the reference feeds int64 0/1 masks to `memory_key_padding_mask`,
      which torch>=2 rejects (`PhonemeSaL.py:122-131`) — the intended bool
      "True = ignore" mask is passed here.

    Our decoder's sqrt(d)-scaled embedding is the reference's unscaled one
    reparameterized (models/phoneme.py PhonemeSaL docstring): importing
    `weight / sqrt(d)` makes the two numerically equal.
    """
    import functools

    from transformers import T5Config as HFT5Config

    from phoneme_vqa_tpu.data.synthetic import make_sal_fixture, tiny_sal_yaml
    from phoneme_vqa_tpu.models.hf_import import ImportReport, import_t5_params

    max_len = 12
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="PhonemeSaL_Executor", MODEL_CLASS="PhonemeSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        num_decoder_layers=2, n_head=4, max_a_length=24,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer
    d_model = 32

    ref_mod = load_reference_package("core.model.PhonemeSaL")
    sal_utils = load_reference_package("core.model.modules.SaL_utils")

    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    t5_cfg.new_token_embedding_size = 512
    t5_cfg.ocr_hidden = config.ocr_hidden
    t5_cfg.obj_hidden = config.obj_hidden
    t5_cfg.num_decoder_layers = 2
    t5_cfg.n_head = 4

    class _EncF:
        @staticmethod
        def from_pretrained(name):
            return sal_utils.T52DEncoderModel(t5_cfg)

    old = (
        ref_mod.T52DEncoderModel,
        ref_mod.RelativePositionBias1D,
        ref_mod.SCPRelativePositionBias,
    )
    ref_mod.T52DEncoderModel = _EncF
    ref_mod.RelativePositionBias1D = functools.partial(
        sal_utils.RelativePositionBias1D, device="cpu"
    )
    ref_mod.SCPRelativePositionBias = functools.partial(
        sal_utils.SCPRelativePositionBias, device="cpu"
    )
    try:
        torch.manual_seed(29)
        ref = ref_mod.PhonemeSaL(
            t5_cfg, vocab_size=tok.size, obj_dropout=0.0, ocr_dropout=0.0
        ).eval()
    finally:
        (
            ref_mod.T52DEncoderModel,
            ref_mod.RelativePositionBias1D,
            ref_mod.SCPRelativePositionBias,
        ) = old

    # --- weight import -------------------------------------------------------
    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    sd = {k: v.numpy() for k, v in ref.encoder.state_dict().items()}
    sd.pop("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    params["t5"] = import_t5_params(params["t5"], sd, report=report)
    assert not report.failed, report.failed
    params["rel2d"]["rel1d"]["embedding"] = (
        ref.rel2Dbias.Relative1D.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    params["rel2d"]["scp"]["embedding"] = (
        ref.rel2Dbias.SCP.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    for stream in ("ocr", "obj"):
        proj = getattr(ref, f"{stream}_feature_projector")
        bbox = getattr(ref, f"{stream}_bbox_projector")
        norm = getattr(ref, f"{stream}_feature_layer_norm")
        params[f"{stream}_feature_projector"]["kernel"] = (
            proj.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_feature_projector"]["bias"] = (
            proj.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["kernel"] = (
            bbox.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["bias"] = (
            bbox.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_norm"]["weight"] = (
            norm.weight.detach().numpy().astype(np.float32)
        )
    # custom decoder: unscaled reference embedding -> our scaled one
    dec = params["decoder"]
    dec["embed"]["embedding"] = (
        ref.tgt_tok_emb.weight.detach().numpy() / np.sqrt(d_model)
    ).astype(np.float32)
    dec["lm_head"]["kernel"] = ref.lm_head.weight.detach().numpy().T.astype(np.float32)
    dec["lm_head"]["bias"] = ref.lm_head.bias.detach().numpy().astype(np.float32)
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: fusion + biased encoder + break_signal greedy -------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        tt = lambda k, dt: torch.tensor(np.asarray(batch[k])).to(dt)
        with torch.no_grad():
            obj_emb = ref._calculate_obj_embedding(
                tt("tokenized_obj", torch.long),
                tt("obj_coordinates", torch.float32),
                tt("obj_features", torch.float32),
            )
            ocr_emb = ref._calculate_ocr_embedding(
                tt("tokenized_ocr", torch.long),
                tt("ocr_coordinates", torch.float32),
                tt("ocr_features", torch.float32),
            )
            ques_emb = ref.encoder.shared(tt("input_ids", torch.long))
            emb = torch.cat([ques_emb, ocr_emb, obj_emb], dim=1)
            mask = torch.cat(
                [
                    tt("src_attention_mask", torch.long),
                    tt("ocr_attention_mask", torch.long),
                    tt("obj_attention_mask", torch.long),
                ],
                dim=1,
            )
            bias = ref.rel2Dbias(
                emb, mask, tt("ocr_coordinates", torch.float32),
                config.max_q_length, config.max_ocr_length,
            )
            ext = (1.0 - mask.to(torch.float32)) * torch.finfo(torch.float32).min
            bias = bias + ext[:, None, None, :]
            enc_out = ref.encoder(
                attention_mask=mask, inputs_embeds=emb, position_bias=bias
            ).last_hidden_state

            bz = emb.shape[0]
            ys = torch.full((bz, 1), tok.bos_idx, dtype=torch.long)
            break_signal = torch.zeros_like(ys)
            for _ in range(max_len - 1):
                out = ref.decode(ys, enc_out, mask == 0)  # bool: True = ignore
                nxt = torch.argmax(ref.lm_head(out)[:, -1], dim=-1)
                break_signal = torch.where(nxt == tok.eos_idx, 1, break_signal)
                ys = torch.cat([ys, nxt.unsqueeze(1)], dim=1)
                if torch.all(break_signal):
                    break
        ref_rows.extend(np.asarray(ys)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def _write_annotations(root) -> str:
    import json

    from phoneme_vqa_tpu.data.synthetic import ANSWERS, QUESTIONS

    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    path = os.path.join(str(root), "annotations.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(ann, f, ensure_ascii=False)
    return path


def _repaired_phoneme_embedding():
    """The 3-embedding PhonemeEmbedding the reference's 5-arg call sites
    intend (`/root/reference/core/model/modules/phoneme_utils.py:5` defines
    2 args; `PhonemeLaTr.py:72-78` / `PhonemePreSTU.py:35-41` call with 5).
    Concat layout [onset | rhyme | tone] matches forward's head slicing; the
    same intended form ships in the prototype (`PhonoLaTr/modules.py:27-63`)."""

    class _Repaired(torch.nn.Module):
        def __init__(self, onset_vocab, rhyme_vocab, tone_vocab,
                     onset_dim, rt_dim):
            super().__init__()
            self.onset = torch.nn.Embedding(onset_vocab, onset_dim)
            self.rhyme = torch.nn.Embedding(rhyme_vocab, rt_dim)
            self.tone = torch.nn.Embedding(tone_vocab, rt_dim)

        def forward(self, triples):
            return torch.cat(
                [
                    self.onset(triples[..., 0]),
                    self.rhyme(triples[..., 1]),
                    self.tone(triples[..., 2]),
                ],
                dim=-1,
            )

    return _Repaired


def _import_phoneme_decoder(params, ref, d_model):
    """Map the repaired reference's triple decoder into our
    PhonemeTripleDecoder tree (embeddings unscaled on both sides)."""
    dec = params["decoder"]
    for part in ("onset", "rhyme", "tone"):
        dec[f"{part}_embed"]["embedding"] = (
            getattr(ref.tgt_tok_emb, part).weight.detach().numpy()
            .astype(np.float32)
        )
        head = getattr(ref, f"{part}_lm_head")
        dec[f"{part}_lm_head"]["kernel"] = (
            head.weight.detach().numpy().T.astype(np.float32)
        )
        dec[f"{part}_lm_head"]["bias"] = (
            head.bias.detach().numpy().astype(np.float32)
        )
    dec["shared_lm_head"]["kernel"] = (
        ref.shared_lm_head.weight.detach().numpy().T.astype(np.float32)
    )
    dec["shared_lm_head"]["bias"] = (
        ref.shared_lm_head.bias.detach().numpy().astype(np.float32)
    )
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)


def _reference_triple_greedy(ref, emb, mask, tok, max_len):
    """The reference triple-greedy loop (`PhonemeLaTr.py:169-217`) with its
    documented defects repaired in place:

    * ``shared_lm_head`` applied before the head slicing, as ``forward``
      does (`PhonemeLaTr.py:121` vs `:196-204` where generate skips it);
    * the bool "True = ignore" memory mask torch>=2 requires (the shipped
      code feeds the float 1/0 mask);
    * the start triple is [bos, bos, bos] — the aligned-specials convention
      of our StructuredPhonemeTokenizer (the reference's [bos, 0, 0] relies
      on per-component vocabs it never ships; documented divergence in
      `tokenizers/phoneme_structured.py`).
    """
    with torch.no_grad():
        enc_out = ref.encoder(
            attention_mask=mask, inputs_embeds=emb
        ).last_hidden_state
        bz = emb.shape[0]
        ys = torch.full((bz, 1, 3), tok.bos_id, dtype=torch.long)
        for _ in range(max_len - 1):
            out = ref.decode(ys, enc_out, mask == 0)
            out = ref.shared_lm_head(out)  # the repair: forward applies it
            onset = ref.onset_lm_head(out[:, :, : ref.onset_embed_dim])
            rhyme = ref.rhyme_lm_head(
                out[:, :, ref.onset_embed_dim : ref.onset_embed_dim
                    + ref.rhyme_tone_embed_dim]
            )
            tone = ref.tone_lm_head(
                out[:, :, ref.onset_embed_dim + ref.rhyme_tone_embed_dim :]
            )
            nxt = torch.stack(
                [
                    torch.argmax(onset[:, -1], dim=-1),
                    torch.argmax(rhyme[:, -1], dim=-1),
                    torch.argmax(tone[:, -1], dim=-1),
                ],
                dim=-1,
            )
            ys = torch.cat([ys, nxt.unsqueeze(1)], dim=1)
            if torch.any(ys[:, :, 0] == tok.eos_id, dim=1).sum() == bz:
                break
    return ys


def test_phoneme_latr_identical_answer_strings_end_to_end(tmp_path):
    """The flagship triple-head family, gated against a MINIMALLY-REPAIRED
    reference PhonemeLaTr (`/root/reference/core/model/PhonemeLaTr.py`): the
    class as shipped cannot be constructed (PhonemeEmbedding 2-arg def /
    5-arg call) and its generate skips the shared lm projection its own
    forward applies — both repairs are documented in-test and mirrored from
    the intended behavior (`PhonoLaTr/modules.py:27-63`, `PhonemeLaTr.py:121`).
    Our production `executor.infer` (jitted triple-stream while_loop decode +
    compose_word detokenization) must emit identical answer strings."""
    from transformers import (
        T5Config as HFT5Config,
        T5EncoderModel,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    max_len = 12
    d_model = 32
    paths = make_latr_fixture(tmp_path)
    ann_path = _write_annotations(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2, n_head=4, NUM_FREEZE_EPOCH=0,
        isgreedy=True, num_beam=1, max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer

    ref_mod = load_reference_package("core.model.PhonemeLaTr")
    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
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

    old = (ref_mod.T5EncoderModel, ref_mod.ViTModel, ref_mod.PhonemeEmbedding)
    ref_mod.T5EncoderModel, ref_mod.ViTModel = _T5EncF, _ViTF
    ref_mod.PhonemeEmbedding = _repaired_phoneme_embedding()
    try:
        t5_cfg.max_2d_position_embeddings = 1024
        t5_cfg.vit_model = "unused-offline"
        t5_cfg.num_decoder_layers = 2
        t5_cfg.n_head = 4
        torch.manual_seed(37)
        ref = ref_mod.PhonemeLaTr(
            t5_cfg, tok.onset_size, tok.rhyme_size, tok.tone_size
        ).eval()
    finally:
        (
            ref_mod.T5EncoderModel, ref_mod.ViTModel, ref_mod.PhonemeEmbedding
        ) = old

    # --- weight import -------------------------------------------------------
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
    _import_phoneme_decoder(params, ref, d_model)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- repaired reference path ---------------------------------------------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref._calculate_embedding(
                torch.tensor(np.asarray(batch["pixel_values"])),
                torch.tensor(np.asarray(batch["coordinates"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["input_ids"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["ocr_attention_mask"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["src_attention_mask"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["tokenized_ocr"]), dtype=torch.long),
            )
        ys = _reference_triple_greedy(ref, emb, mask, tok, max_len)
        ref_rows.extend(list(np.asarray(ys)[:n_valid]))
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_phoneme_prestu_identical_answer_strings_end_to_end(tmp_path):
    """Same repaired-reference gate for PhonemePreSTU
    (`/root/reference/core/model/PhonemePreSTU.py`): additionally, its
    ``greedy_generate`` calls a 6-arg ``_calculate_embedding`` that is
    defined 3-arg (`:150-151` vs `:187`) — the 3-arg fusion (the one
    ``forward`` intends) is driven directly here."""
    from transformers import (
        T5Config as HFT5Config,
        T5EncoderModel,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    max_len = 12
    d_model = 32
    paths = make_latr_fixture(tmp_path)
    ann_path = _write_annotations(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="PhonemePreSTU_Executor", MODEL_CLASS="PhonemePreSTU",
        MODEL_MOD_CONFIG_CLASS="CustomizedPreSTU_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2, n_head=4, NUM_FREEZE_EPOCH=0,
        isgreedy=True, num_beam=1, max_a_length=16, max_input_length=20,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer

    ref_mod = load_reference_package("core.model.PhonemePreSTU")
    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
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

    old = (ref_mod.T5EncoderModel, ref_mod.ViTModel, ref_mod.PhonemeEmbedding)
    ref_mod.T5EncoderModel, ref_mod.ViTModel = _T5EncF, _ViTF
    ref_mod.PhonemeEmbedding = _repaired_phoneme_embedding()
    try:
        t5_cfg.vit_model = "unused-offline"
        t5_cfg.num_decoder_layers = 2
        t5_cfg.n_head = 4
        torch.manual_seed(41)
        ref = ref_mod.PhonemePreSTU(
            t5_cfg, tok.onset_size, tok.rhyme_size, tok.tone_size
        ).eval()
    finally:
        (
            ref_mod.T5EncoderModel, ref_mod.ViTModel, ref_mod.PhonemeEmbedding
        ) = old

    # --- weight import -------------------------------------------------------
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
    params["visual_projector"]["kernel"] = (
        ref.visual_projector.weight.detach().numpy().T.astype(np.float32)
    )
    params["visual_projector"]["bias"] = (
        ref.visual_projector.bias.detach().numpy().astype(np.float32)
    )
    _import_phoneme_decoder(params, ref, d_model)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- repaired reference path ---------------------------------------------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref._calculate_embedding(  # the 3-arg fusion (:187)
                torch.tensor(np.asarray(batch["pixel_values"])),
                torch.tensor(np.asarray(batch["input_ids"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["src_attention_mask"]), dtype=torch.long),
            )
        ys = _reference_triple_greedy(ref, emb, mask, tok, max_len)
        ref_rows.extend(list(np.asarray(ys)[:n_valid]))
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_prestu_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for the PreSTU family (no spatial stream; OCR fused into
    input_ids by the dataset)."""
    from transformers import (
        T5Config as HFT5Config,
        T5ForConditionalGeneration,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    max_len = 10
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="PreSTU_Executor", MODEL_CLASS="PreSTU",
        MODEL_MOD_CONFIG_CLASS="PreSTU_config", max_input_length=20,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")

    ref_mod = load_reference_package("core.model.PreSTU")
    t5_cfg = HFT5Config(
        vocab_size=512, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    vit_cfg = HFViTConfig(
        image_size=32, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )

    class _T5F:
        @staticmethod
        def from_pretrained(name):
            return T5ForConditionalGeneration(t5_cfg)

    class _ViTF:
        @staticmethod
        def from_pretrained(name):
            return ViTModel(vit_cfg)

    old = (ref_mod.T5ForConditionalGeneration, ref_mod.ViTModel)
    ref_mod.T5ForConditionalGeneration, ref_mod.ViTModel = _T5F, _ViTF
    try:
        t5_cfg.vit_model = "unused-offline"
        torch.manual_seed(7)
        ref = ref_mod.PreSTU(t5_cfg).eval()
    finally:
        ref_mod.T5ForConditionalGeneration, ref_mod.ViTModel = old

    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    params["t5"] = import_t5_params(
        params["t5"], {k: v.numpy() for k, v in ref.backbone.state_dict().items()},
        report=report,
    )
    params["vit"] = import_vit_params(
        params["vit"], {k: v.numpy() for k, v in ref.vit.state_dict().items()},
        report=report,
    )
    assert not report.failed, report.failed
    params["visual_projector"]["kernel"] = (
        ref.visual_projector.weight.detach().numpy().T.astype(np.float32)
    )
    params["visual_projector"]["bias"] = (
        ref.visual_projector.bias.detach().numpy().astype(np.float32)
    )
    ex.state = ex.state.replace(params=params)
    ex._place_state()

    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref.calculate_embedding(
                torch.tensor(batch["pixel_values"]),
                torch.tensor(batch["input_ids"], dtype=torch.long),
                torch.tensor(batch["src_attention_mask"], dtype=torch.long),
            )
            out = ref.backbone.generate(
                inputs_embeds=emb, attention_mask=mask.long(),
                max_length=max_len, do_sample=False, num_beams=1,
            )
        ref_rows.extend(np.asarray(out)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))


def test_customized_prestu_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for CustomizedPreSTU (`/root/reference/core/model/
    CustomizedPreSTU.py:16-144`): T5 *encoder-only* backbone over the fused
    [ViT patches, shared-embed(q⊕ocr ids)] sequence, then the custom decoder
    (scaled TokenEmbedding + sinusoidal PE + nn.TransformerDecoder + lm head)
    over a pluggable answer tokenizer, greedy full-re-decode loop
    (`CustomizedPreSTU.py:95-126`; `isgreedy` is ignored there — greedy only).

    As with CustomizedLaTr, the reference feeds its float 1/0 attention mask
    to `memory_key_padding_mask` (`CustomizedPreSTU.py:70-73`), which
    torch>=2 rejects — the intended bool "True = ignore" mask is passed here
    (README "Reference bugs fixed by design")."""
    from transformers import (
        T5Config as HFT5Config,
        T5EncoderModel,
        ViTConfig as HFViTConfig,
        ViTModel,
    )

    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_t5_params,
        import_vit_params,
    )

    max_len = 12
    d_model = 32
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="CustomizedPreSTU_Executor", MODEL_CLASS="CustomizedPreSTU",
        MODEL_MOD_CONFIG_CLASS="CustomizedPreSTU_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=16,
        max_input_length=20,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer

    ref_mod = load_reference_package("core.model.CustomizedPreSTU")
    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
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

    old = (ref_mod.T5EncoderModel, ref_mod.ViTModel)
    ref_mod.T5EncoderModel, ref_mod.ViTModel = _T5EncF, _ViTF
    try:
        t5_cfg.vit_model = "unused-offline"
        t5_cfg.num_decoder_layers = 2
        t5_cfg.n_head = 4
        torch.manual_seed(29)
        ref = ref_mod.CustomizedPreSTU(t5_cfg, tgt_vocab_size=len(tok)).eval()
    finally:
        ref_mod.T5EncoderModel, ref_mod.ViTModel = old

    # --- weight import -------------------------------------------------------
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
    params["visual_projector"]["kernel"] = (
        ref.visual_projector.weight.detach().numpy().T.astype(np.float32)
    )
    params["visual_projector"]["bias"] = (
        ref.visual_projector.bias.detach().numpy().astype(np.float32)
    )
    dec = params["decoder"]
    dec["embed"]["embedding"] = (
        ref.tgt_tok_emb.embedding.weight.detach().numpy().astype(np.float32)
    )
    dec["lm_head"]["kernel"] = ref.lm_head.weight.detach().numpy().T.astype(np.float32)
    dec["lm_head"]["bias"] = ref.lm_head.bias.detach().numpy().astype(np.float32)
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: fusion + encoder + greedy full re-decode ------------
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        with torch.no_grad():
            emb, mask = ref._calculate_embedding(
                torch.tensor(np.asarray(batch["pixel_values"])),
                torch.tensor(np.asarray(batch["input_ids"]), dtype=torch.long),
                torch.tensor(np.asarray(batch["src_attention_mask"]), dtype=torch.long),
            )
            enc_out = ref.encoder(
                attention_mask=mask, inputs_embeds=emb
            ).last_hidden_state
            bz = emb.shape[0]
            ys = torch.full((bz, 1), tok.bos_id, dtype=torch.long)
            for _ in range(max_len - 1):
                out = ref.decode(ys, enc_out, mask == 0)  # bool: True = ignore
                nxt = torch.argmax(ref.lm_head(out[:, -1]), dim=-1)
                ys = torch.cat([ys, nxt.view(bz, 1)], dim=1)
                if (ys == tok.eos_id).any(dim=1).sum() == bz:
                    break
        ref_rows.extend(np.asarray(ys)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6


def test_customized_sal_identical_answer_strings_end_to_end(tmp_path):
    """Same gate for CustomizedSaL (`/root/reference/core/model/
    CustomizedSaL.py:29-233`): SaL fusion (question/OCR/object streams with
    det⊕rec and region features) + injected 2D relative-position bias
    encoder, then the custom decoder (scaled TokenEmbedding + sinusoidal PE +
    nn.TransformerDecoder + lm head) over a pluggable answer tokenizer,
    greedy full-re-decode loop (`CustomizedSaL.py:174-233`).

    The reference executor's train mode is unlaunchable as shipped
    (`CustomizedSaL_Executor.py:81` uses the undefined `self.optimizer`) but
    the model's greedy decode runs; this gate targets that path.
    Reconstructed intended-mask semantics as in the other SaL gates: the
    injected bias gets the padding mask pre-added, and the bool
    "True = ignore" form is fed to `memory_key_padding_mask`."""
    import functools

    from transformers import T5Config as HFT5Config

    from phoneme_vqa_tpu.data.synthetic import make_sal_fixture, tiny_sal_yaml
    from phoneme_vqa_tpu.models.hf_import import ImportReport, import_t5_params

    max_len = 12
    d_model = 32
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="CustomizedSaL_Executor", MODEL_CLASS="CustomizedSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tok = ex.decode_tokenizer

    ref_mod = load_reference_package("core.model.CustomizedSaL")
    sal_utils = load_reference_package("core.model.modules.SaL_utils")

    t5_cfg = HFT5Config(
        vocab_size=512, d_model=d_model, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    t5_cfg.new_token_embedding_size = 512
    t5_cfg.ocr_hidden = config.ocr_hidden
    t5_cfg.obj_hidden = config.obj_hidden
    t5_cfg.num_decoder_layers = 2
    t5_cfg.n_head = 4

    class _EncF:
        @staticmethod
        def from_pretrained(name):
            return sal_utils.T52DEncoderModel(t5_cfg)

    old = (
        ref_mod.T52DEncoderModel,
        ref_mod.RelativePositionBias1D,
        ref_mod.SCPRelativePositionBias,
    )
    ref_mod.T52DEncoderModel = _EncF
    ref_mod.RelativePositionBias1D = functools.partial(
        sal_utils.RelativePositionBias1D, device="cpu"
    )
    ref_mod.SCPRelativePositionBias = functools.partial(
        sal_utils.SCPRelativePositionBias, device="cpu"
    )
    try:
        torch.manual_seed(31)
        ref = ref_mod.CustomizedSaL(
            t5_cfg, tgt_vocab_size=len(tok), obj_dropout=0.0, ocr_dropout=0.0
        ).eval()
    finally:
        (
            ref_mod.T52DEncoderModel,
            ref_mod.RelativePositionBias1D,
            ref_mod.SCPRelativePositionBias,
        ) = old

    # --- weight import -------------------------------------------------------
    params = jax.tree.map(np.asarray, ex.state.params)
    report = ImportReport()
    sd = {k: v.numpy() for k, v in ref.encoder.state_dict().items()}
    sd.pop("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    params["t5"] = import_t5_params(params["t5"], sd, report=report)
    assert not report.failed, report.failed
    params["rel2d"]["rel1d"]["embedding"] = (
        ref.rel2Dbias.Relative1D.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    params["rel2d"]["scp"]["embedding"] = (
        ref.rel2Dbias.SCP.relative_attention_bias.weight.detach().numpy()
    ).astype(np.float32)
    for stream in ("ocr", "obj"):
        proj = getattr(ref, f"{stream}_feature_projector")
        bbox = getattr(ref, f"{stream}_bbox_projector")
        norm = getattr(ref, f"{stream}_feature_layer_norm")
        params[f"{stream}_feature_projector"]["kernel"] = (
            proj.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_feature_projector"]["bias"] = (
            proj.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["kernel"] = (
            bbox.weight.detach().numpy().T.astype(np.float32)
        )
        params[f"{stream}_bbox_projector"]["bias"] = (
            bbox.bias.detach().numpy().astype(np.float32)
        )
        params[f"{stream}_norm"]["weight"] = (
            norm.weight.detach().numpy().astype(np.float32)
        )
    dec = params["decoder"]
    # reference TokenEmbedding is sqrt(d)-scaled like ours: import directly
    dec["embed"]["embedding"] = (
        ref.tgt_tok_emb.embedding.weight.detach().numpy().astype(np.float32)
    )
    dec["lm_head"]["kernel"] = ref.lm_head.weight.detach().numpy().T.astype(np.float32)
    dec["lm_head"]["bias"] = ref.lm_head.bias.detach().numpy().astype(np.float32)
    _import_torch_decoder_layers(dec, ref.decoder.decoder.layers)
    ex.state = ex.state.replace(params=jax.tree.map(np.asarray, params))
    ex._place_state()

    # --- our production path -------------------------------------------------
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # --- reference path: fusion + biased encoder + greedy full re-decode -----
    ref_rows = []
    for batch, n_valid in batch_iterator(
        ex.val_data, config.EVAL_BATCH_SIZE, pad_final=False
    ):
        tt = lambda k, dt: torch.tensor(np.asarray(batch[k])).to(dt)
        with torch.no_grad():
            obj_emb = ref._calculate_obj_embedding(
                tt("tokenized_obj", torch.long),
                tt("obj_coordinates", torch.float32),
                tt("obj_features", torch.float32),
            )
            ocr_emb = ref._calculate_ocr_embedding(
                tt("tokenized_ocr", torch.long),
                tt("ocr_coordinates", torch.float32),
                tt("ocr_features", torch.float32),
            )
            ques_emb = ref.encoder.shared(tt("input_ids", torch.long))
            emb = torch.cat([ques_emb, ocr_emb, obj_emb], dim=1)
            mask = torch.cat(
                [
                    tt("src_attention_mask", torch.long),
                    tt("ocr_attention_mask", torch.long),
                    tt("obj_attention_mask", torch.long),
                ],
                dim=1,
            )
            bias = ref.rel2Dbias(
                emb, mask, tt("ocr_coordinates", torch.float32),
                config.max_q_length, config.max_ocr_length,
            )
            ext = (1.0 - mask.to(torch.float32)) * torch.finfo(torch.float32).min
            bias = bias + ext[:, None, None, :]
            enc_out = ref.encoder(
                attention_mask=mask, inputs_embeds=emb, position_bias=bias
            ).last_hidden_state

            bz = emb.shape[0]
            ys = torch.full((bz, 1), tok.bos_id, dtype=torch.long)
            for _ in range(max_len - 1):
                out = ref.decode(ys, enc_out, mask == 0)  # bool: True = ignore
                nxt = torch.argmax(ref.lm_head(out[:, -1]), dim=-1)
                ys = torch.cat([ys, nxt.view(bz, 1)], dim=1)
                if (ys == tok.eos_id).any(dim=1).sum() == bz:
                    break
        ref_rows.extend(np.asarray(ys)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6
