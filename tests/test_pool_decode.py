"""EVAL_CONTINUOUS (slot-refill pool decode): answers identical to the batch
greedy path for the stock-T5, custom-decoder and phoneme-triple families.

The pool decode (`decode/pool.py`) re-runs each row through `decode_step_k`
at per-row positions; in f32 the outputs must equal `greedy_decode`'s
row-for-row (the bf16 near-tie caveat is repo-wide, README). Fixtures force
multiple pool chunks (EVAL_POOL_ROWS < dataset) and fewer slots than rows so
refill and the trash row are exercised.
"""

import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml
from .test_executor_phoneme import _write_annotations


def _infer_both(config_path, batch=4, maxl=10):
    config = get_config(config_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    want = ex.infer(ex.val_data, batch, maxl)
    assert not ex._use_pool_decode()
    ex.config["EVAL_CONTINUOUS"] = True
    ex.config["EVAL_POOL_ROWS"] = 5  # 12 rows -> 3 pool chunks (5/5/2)
    ex.config["EVAL_SLOTS"] = 3  # < rows: refill happens
    assert ex._use_pool_decode()
    got = ex.infer(ex.val_data, batch, maxl)
    return ex, want, got


def test_latr_pool_identity(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, DTYPE="float32",
    )
    ex, want, got = _infer_both(yaml_path)
    assert got == want
    # scores ride the same loop: parity with the batch scoring path
    a_b, s_b = ex.infer(ex.val_data, 4, 10, return_scores=True)
    ex.config["EVAL_CONTINUOUS"] = False
    a_g, s_g = ex.infer(ex.val_data, 4, 10, return_scores=True)
    assert a_b == a_g == want
    np.testing.assert_allclose(s_b, s_g, rtol=1e-5, atol=1e-6)


def test_customized_pool_identity(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, DTYPE="float32",
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=10,
    )
    _, want, got = _infer_both(yaml_path)
    assert got == want


def test_phoneme_pool_identity(tmp_path):
    paths = make_latr_fixture(tmp_path)
    ann_path = _write_annotations(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, DTYPE="float32",
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path], num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=True, num_beam=1, max_a_length=10,
    )
    _, want, got = _infer_both(yaml_path)
    assert got == want


def test_pool_falls_back_for_beam(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, DTYPE="float32",
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, isgreedy=False, num_beam=2, max_a_length=10,
        EVAL_CONTINUOUS=True,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    assert not ex._use_pool_decode()  # beam config -> batch decode
    assert ex.infer(ex.val_data, 4, 10)  # still answers
