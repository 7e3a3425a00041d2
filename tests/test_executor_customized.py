"""Customized family end-to-end: pluggable answer tokenizers + custom decoder."""

import os

import numpy as np
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, make_sal_fixture, tiny_latr_yaml, tiny_sal_yaml



pytestmark = pytest.mark.slow

def _customized_overrides(tmp_path, tokenizer="ByteTokenizer"):
    return dict(
        EXECUTOR="CustomizedLaTr_Executor",
        MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer=tokenizer,
        bpe_step=4,
        vocab_save_path=str(tmp_path / "bpevocab.json"),
        max_vocab_size=300,
        num_decoder_layers=2,
        n_head=4,
        NUM_FREEZE_EPOCH=1,
        NUM_EPOCHS=1,
        isgreedy=True,
        num_beam=1,
        max_a_length=16,
    )


@pytest.mark.parametrize("tokenizer", ["ByteTokenizer", "CharTokenizer", "BPE_Tokenizer"])
def test_customized_latr_train_eval(tmp_path, tokenizer):
    paths = make_latr_fixture(tmp_path)
    save_path = str(tmp_path / f"ck_{tokenizer}")
    yaml_path = tiny_latr_yaml(
        paths, save_path, **_customized_overrides(tmp_path, tokenizer)
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    assert os.path.isdir(os.path.join(save_path, "last_ckp"))
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert set(scores) == {"F1", "Accuracy", "CIDEr", "ROUGE", "BLEU"}


def test_customized_freeze_keeps_encoder_params(tmp_path):
    """During NUM_FREEZE_EPOCH epochs the T5 subtree must not change."""
    import jax

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), **_customized_overrides(tmp_path)
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    before = jax.tree.map(np.asarray, ex.state.params["t5"])
    dec_before = np.asarray(
        jax.tree.leaves(ex.state.params["decoder"])[0]
    ).copy()
    ex._train_epoch(1)  # epoch 1 <= NUM_FREEZE_EPOCH=1 -> frozen
    after = ex.state.params["t5"]
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the decoder DID train
    dec_after = np.asarray(jax.tree.leaves(ex.state.params["decoder"])[0])
    assert not np.array_equal(dec_before, dec_after)
    # epoch 2: encoder unfrozen -> changes
    ex._train_epoch(2)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(ex.state.params["t5"]))
    )
    assert changed


def test_customized_sal_train(tmp_path):
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths,
        str(tmp_path / "ck"),
        EXECUTOR="CustomizedSaL_Executor",
        MODEL_CLASS="CustomizedSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        DecodeTokenizer="ByteTokenizer",
        num_decoder_layers=2,
        n_head=4,
        max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    ex.run()
    scores = EXECUTORS.get(config.EXECUTOR)(config, mode="eval", evaltype="last").run()
    assert "Accuracy" in scores
