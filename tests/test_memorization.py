"""End-to-end learning gate: train-to-memorization on a tiny fixture.

The strongest honest evidence that the full training loop *learns* (not just
runs): a tiny random-init LaTr trained on 96 synthetic rows must emit the
exact training answer strings through the real `infer` decode path. This is
the behavior the reference demonstrates only implicitly via "loss goes down"
(`/root/reference/core/executor/base_executor.py:92-94`); here it is a hard
gate on answer strings.

This also pins the train/decode coherence contract: the `"<pad> " + answer`
decoder-input convention (data/latr.py) must map to the same start symbol the
greedy decode seeds with — a mismatch (e.g. a tokenizer that does not parse
special-token strings) shows up as loss going down while generations stay
empty.
"""

import os

import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
from phoneme_vqa_tpu.utils.registry import EXECUTORS


@pytest.mark.slow
def test_customized_latr_trains_to_memorization(tmp_path):
    """Same gate for the custom-decoder family: its train/decode contract
    (pluggable byte tokenizer, bos/eos-framed labels, label pad masks,
    nn.TransformerDecoder-equivalent) must be coherent end to end — a model
    at near-zero loss must emit the exact answer strings through the real
    greedy decode. Decode caps must cover the longest answer (21 bytes +
    bos/eos here); measured: exact-match 1.00 by epoch 5 at LR 3e-3."""
    paths = make_latr_fixture(str(tmp_path), n_rows=96)
    yaml_path = tiny_latr_yaml(
        paths, os.path.join(str(tmp_path), "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, LR=3e-3, TRAIN_BATCH_SIZE=8,
        max_a_length=28, max_eval_length=26, isgreedy=True, num_beam=1,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    losses = [ex._train_epoch(epoch) for epoch in range(1, 9)]
    gens = ex.infer(ex.val_data, 8, 26)
    answers = [str(a) for a in ex.val_answer]
    acc = sum(g == a for g, a in zip(gens, answers)) / len(gens)
    assert losses[-1] < losses[0] * 0.3, losses
    assert acc == 1.0, list(zip(gens, answers))[:8]


@pytest.mark.slow
def test_phoneme_triple_trains_to_memorization(tmp_path):
    """The flagship path's coherence gate: (onset, rhyme, tone) triple-stream
    training + triple greedy decode + compose_word detokenization must
    reproduce the exact diacritic-correct Vietnamese answer strings once the
    summed triple CE approaches zero. Measured: exact-match 1.00 by epoch 10
    at LR 3e-3 (e.g. 'quán phở hà nội' rebuilt from component ids)."""
    import json

    from phoneme_vqa_tpu.data.synthetic import ANSWERS, QUESTIONS

    paths = make_latr_fixture(str(tmp_path), n_rows=96)
    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    ann_path = os.path.join(str(tmp_path), "ann.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f, ensure_ascii=False)
    yaml_path = tiny_latr_yaml(
        paths, os.path.join(str(tmp_path), "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=os.path.join(str(tmp_path), "pv.json"),
        annotation_paths=[ann_path], num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, LR=3e-3, TRAIN_BATCH_SIZE=8,
        max_a_length=16, max_eval_length=14, isgreedy=True, num_beam=1,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    losses = [ex._train_epoch(epoch) for epoch in range(1, 13)]
    gens = ex.infer(ex.val_data, 8, 14)
    answers = [str(a) for a in ex.val_answer]
    acc = sum(g == a for g, a in zip(gens, answers)) / len(gens)
    assert losses[-1] < losses[0] * 0.3, losses
    assert acc == 1.0, list(zip(gens, answers))[:8]


@pytest.mark.slow
def test_latr_trains_to_memorization(tmp_path):
    paths = make_latr_fixture(str(tmp_path), n_rows=96)
    yaml_path = tiny_latr_yaml(
        paths,
        os.path.join(str(tmp_path), "ck"),
        NUM_EPOCHS=1,
        SAVE=False,
        LR=3e-3,
        TRAIN_BATCH_SIZE=8,
        max_eval_length=12,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")

    losses = []
    for epoch in range(1, 13):
        losses.append(ex._train_epoch(epoch))
    gens = ex.infer(ex.val_data, 8, 12)
    answers = [str(a) for a in ex.val_answer]
    acc = sum(g == a for g, a in zip(gens, answers)) / len(gens)

    assert losses[-1] < losses[0] * 0.7, losses
    # the fixture + seeds are deterministic: the gate asserts the full
    # claimed memorization (README), not a flake-tolerant fraction
    assert acc == 1.0, list(zip(gens, answers))[:8]
