"""Phoneme family end-to-end: triple-stream LaTr/PreSTU + flat SaL."""

import json
import os

import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import (
    ANSWERS,
    QUESTIONS,
    make_latr_fixture,
    make_sal_fixture,
    tiny_latr_yaml,
    tiny_sal_yaml,
)



pytestmark = pytest.mark.slow

def _write_annotations(root) -> str:
    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    path = os.path.join(str(root), "annotations.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(ann, f, ensure_ascii=False)
    return path


def test_phoneme_latr_train_eval_predict(tmp_path):
    paths = make_latr_fixture(tmp_path)
    ann_path = _write_annotations(tmp_path)
    save_path = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(
        paths,
        save_path,
        EXECUTOR="PhonemeLaTr_Executor",
        MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2,
        n_head=4,
        NUM_FREEZE_EPOCH=0,
        max_a_length=16,
        isgreedy=True,
        num_beam=1,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert set(scores) == {"F1", "Accuracy", "CIDEr", "ROUGE", "BLEU"}
    results = EXECUTORS.get(config.EXECUTOR)(
        config, mode="predict", predicttype="best"
    ).run()
    assert len(results) == 6
    # generated strings must be decodable text (possibly empty for a random model)
    assert all(isinstance(r["gens"][0], str) for r in results)


def test_phoneme_prestu_smoke(tmp_path):
    """The mode the reference ships unlaunchable (broken export) works here."""
    paths = make_latr_fixture(tmp_path)
    ann_path = _write_annotations(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths,
        str(tmp_path / "ck"),
        EXECUTOR="PhonemePreSTU_Executor",
        MODEL_CLASS="PhonemePreSTU",
        MODEL_MOD_CONFIG_CLASS="CustomizedPreSTU_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2,
        n_head=4,
        NUM_FREEZE_EPOCH=0,
        max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    loss = ex._train_epoch(1)
    assert np.isfinite(loss)


def test_phoneme_sal_train_eval(tmp_path):
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths,
        str(tmp_path / "ck"),
        EXECUTOR="PhonemeSaL_Executor",
        MODEL_CLASS="PhonemeSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        num_decoder_layers=2,
        n_head=4,
        max_a_length=24,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert "Accuracy" in scores


def test_phoneme_triple_label_encoding(tmp_path):
    """Triple labels land as (N, T, 3) arrays with aligned pad masks."""
    from phoneme_vqa_tpu.tokenizers import StructuredPhonemeTokenizer

    ann_path = _write_annotations(tmp_path)
    tok = StructuredPhonemeTokenizer(annotation_paths=[ann_path])
    triples, mask = (
        tok.encode("quán phở hà nội", 12),
        None,
    )
    arr = np.asarray(triples)
    assert arr.shape == (12, 3)
    assert (arr[0] == tok.bos_id).all()
    assert tok.decode(arr) == "quán phở hà nội"
