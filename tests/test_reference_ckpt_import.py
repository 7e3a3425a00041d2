"""Reference-checkpoint migration: a torch.save .pth from the reference
trains' format converts into our orbax checkpoint and produces IDENTICAL
answer strings through our eval path."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.loader import batch_iterator
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml
from .reference_loader import REFERENCE_ROOT

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_reference_pth_then_identical_answers(tmp_path):
    from .test_e2e_reference_parity import _reference_model

    max_len = 10
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=True,
        DTYPE="float32", max_eval_length=max_len,
    )
    config = get_config(yaml_path)

    # a "trained" reference checkpoint in the reference's on-disk format
    # (base_executor.py:100-124)
    ref = _reference_model()
    pth = str(tmp_path / "best_ckp.pth")
    torch.save(
        {"state_dict": ref.state_dict(), "epoch": 3, "best_score": 0.5}, pth
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_reference_ckpt.py"),
         "--config-file", yaml_path, "--ckpt", pth, "--name", "best"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(str(tmp_path / "ck"), "best_ckp"))

    # our eval path on the converted checkpoint
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex._load_trained_checkpoint("best")
    ex._place_state()
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)

    # the reference model's own decode on the same arrays
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
                inputs_embeds=emb, attention_mask=mask.long(),
                max_length=max_len, do_sample=False, num_beams=1,
            )
        ref_rows.extend(np.asarray(out)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))
    assert len(ours) == 6

    # fine-tuning on top of a converted (params-only) checkpoint resumes the
    # params with a fresh optimizer — never silently random-restarts
    ex_train = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    a = np.asarray(jax.tree.leaves(ex_train.state.params)[0])
    b = np.asarray(jax.tree.leaves(ex.state.params)[0])
    np.testing.assert_array_equal(a, b)
    assert int(ex_train.state.epoch) == 3  # carried from the .pth


def test_import_reference_state_dict_reports_unmappable(tmp_path):
    """Loud failure: a tensor with no destination or a wrong shape lands in
    report.failed, never silently dropped."""
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_reference_state_dict,
    )

    params = {"visual_projector": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)}}
    report = ImportReport()
    import_reference_state_dict(
        params,
        {
            "visual_projector.weight": np.zeros((8, 4)),
            "visual_projector.bias": np.zeros(9),  # wrong shape
        },
        report=report,
    )
    assert "visual_projector.weight" in report.mapped
    assert any(k == "visual_projector.bias" for k, _ in report.failed)


def test_convert_customized_sal_pth_then_identical_answers(tmp_path):
    """The converter's SaL + custom-decoder routing: rel2d bias tables,
    per-stream projectors/norms, torch TransformerDecoder layers, scaled
    target embedding — all through the script, answers identical."""
    import functools

    from transformers import T5Config as HFT5Config

    from phoneme_vqa_tpu.data.synthetic import make_sal_fixture, tiny_sal_yaml

    from .reference_loader import load_reference_package

    max_len = 12
    d_model = 32
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=True,
        DTYPE="float32", max_eval_length=max_len,
        EXECUTOR="CustomizedSaL_Executor", MODEL_CLASS="CustomizedSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=16,
    )
    config = get_config(yaml_path)

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
        torch.manual_seed(41)
        # 259 = ByteTokenizer vocab (fixed, so sizes line up deterministically)
        ref = ref_mod.CustomizedSaL(
            t5_cfg, tgt_vocab_size=259, obj_dropout=0.0, ocr_dropout=0.0
        ).eval()
    finally:
        (
            ref_mod.T52DEncoderModel,
            ref_mod.RelativePositionBias1D,
            ref_mod.SCPRelativePositionBias,
        ) = old

    pth = str(tmp_path / "best_ckp.pth")
    torch.save({"state_dict": ref.state_dict(), "epoch": 1}, pth)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_reference_ckpt.py"),
         "--config-file", yaml_path, "--ckpt", pth, "--name", "best"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2500:]

    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex._load_trained_checkpoint("best")
    ex._place_state()
    ours = ex.infer(ex.val_data, config.EVAL_BATCH_SIZE, max_len)
    tok = ex.decode_tokenizer

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
                out = ref.decode(ys, enc_out, mask == 0)
                nxt = torch.argmax(ref.lm_head(out[:, -1]), dim=-1)
                ys = torch.cat([ys, nxt.view(bz, 1)], dim=1)
                if (ys == tok.eos_id).any(dim=1).sum() == bz:
                    break
        ref_rows.extend(np.asarray(ys)[:n_valid].tolist())
    theirs = ex._decode_rows(ref_rows)
    assert ours == theirs, list(zip(ours, theirs))


def test_plain_embedding_reparameterized():
    """A plain nn.Embedding tgt_tok_emb (PhonemeSaL) imports as weight/sqrt(d)
    into our sqrt(d)-scaled embedding."""
    from phoneme_vqa_tpu.models.hf_import import (
        ImportReport,
        import_reference_state_dict,
    )

    d = 16
    w = np.random.RandomState(0).randn(10, d).astype(np.float32)
    params = {"decoder": {"embed": {"embedding": np.zeros((10, d), np.float32)}}}
    report = ImportReport()
    out = import_reference_state_dict(
        params, {"tgt_tok_emb.weight": w}, report=report
    )
    np.testing.assert_allclose(
        out["decoder"]["embed"]["embedding"], w / np.sqrt(d), rtol=1e-6
    )
    assert not report.failed


def test_unsafe_load_is_gated(tmp_path):
    """A .pth that fails weights_only=True must NOT silently fall back to
    full unpickling (arbitrary code execution): without --unsafe-load the
    loader exits loudly; with unsafe=True it proceeds (ADVICE r2)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "import_reference_ckpt",
        os.path.join(REPO, "scripts", "import_reference_ckpt.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _NotATensor:
        pass

    # make the class unpicklable-by-allowlist but importable for the
    # unsafe fallback path
    import types

    m = types.ModuleType("_ckpt_test_helper")
    _NotATensor.__module__ = "_ckpt_test_helper"
    _NotATensor.__qualname__ = "_NotATensor"
    m._NotATensor = _NotATensor
    sys.modules["_ckpt_test_helper"] = m
    try:
        path = str(tmp_path / "bad.pth")
        torch.save({"state_dict": {"x": torch.zeros(2)}, "junk": _NotATensor()}, path)
        with pytest.raises(SystemExit, match="unsafe-load"):
            mod.load_reference_ckpt(path)
        out = mod.load_reference_ckpt(path, unsafe=True)
        assert "state_dict" in out
    finally:
        del sys.modules["_ckpt_test_helper"]
