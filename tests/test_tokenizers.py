"""Tokenizer round-trip + parity tests."""

import json
import os

import numpy as np
import pytest

from phoneme_vqa_tpu.phonology.vocab import FLAT_PHONEME_VOCAB, VocabBuilder
from phoneme_vqa_tpu.tokenizers import (
    BPETokenizer,
    ByteTokenizer,
    CharTokenizer,
    FallbackSubwordTokenizer,
    PhonemeTokenizer,
    StructuredPhonemeTokenizer,
)

from .reference_loader import REFERENCE_ROOT, load_reference_module

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
)

SENTENCES = [
    "quán phở gà ngon nhất hà nội",
    "7 giờ 30 phút",
    "nguyễn huệ",
    "covid-19 ở việt nam",
    "xin chào",
    "trường đại học bách khoa",
]


@needs_reference
def test_flat_vocab_parity():
    ref = load_reference_module("core/tokenizer/phoneme_tokenizer.py", "flat_tok")
    ref_tok = ref.PhonemeTokenizer()
    assert {p: i for i, p in enumerate(FLAT_PHONEME_VOCAB)} == ref_tok.phoneme2idx


@needs_reference
def test_flat_encode_decode_parity():
    ref = load_reference_module("core/tokenizer/phoneme_tokenizer.py", "flat_tok")
    ref_tok = ref.PhonemeTokenizer()
    tok = PhonemeTokenizer()
    for s in SENTENCES:
        ours = tok.encode(s, max_length=40)
        theirs = ref_tok.encode(s, max_length=40)
        assert ours == list(theirs), s
        import torch

        assert tok.decode_raw(ours) == ref_tok.decode(torch.tensor(ours)), s


def test_flat_round_trip_composed():
    """Our composed decode recomposes diacritics (the reference's decode
    leaves literal tone tokens in the text). Multi-char non-Vietnamese words
    are split per character by the *encoder* (reference behavior), so they
    come back space-separated."""
    tok = PhonemeTokenizer()
    cases = {
        "quán phở gà ngon nhất hà nội": "quán phở gà ngon nhất hà nội",
        "nguyễn huệ": "nguyễn huệ",
        "7 giờ 30 phút": "7 giờ 3 0 phút",
        "xin chào": "xin chào",
        "trường đại học bách khoa": "trường đại học bách khoa",
    }
    for s, want in cases.items():
        ids = tok.encode(s, max_length=64)
        assert tok.decode(ids) == want, s
        # and the raw variant shows the reference's tone-token artifacts
        assert "<" in tok.decode_raw(tok.encode("quán", 8))


def test_byte_round_trip():
    tok = ByteTokenizer()
    for s in SENTENCES + ["emoji 😀 ok"]:
        ids = tok.encode(s, max_length=64)
        assert len(ids) == 64
        assert tok.batch_decode([ids]) == [s]
    assert len(tok) == 259
    # truncation keeps room for specials
    ids = tok.encode("abcdef", max_length=5)
    assert len(ids) == 5 and ids[0] == tok.bos_id and ids[-1] == tok.eos_id


def test_char_round_trip():
    tok = CharTokenizer()
    for s in SENTENCES:
        ids = tok.encode(s, max_length=64)
        assert len(ids) == 64
        assert tok.batch_decode([ids]) == [s]


@needs_reference
def test_char_byte_parity():
    import torch  # noqa: F401  (reference module needs nothing extra)

    ref_b = load_reference_module("core/tokenizer/byte_tokenizer.py", "byte_tok")
    ref_c = load_reference_module("core/tokenizer/char_tokenizer.py", "char_tok")
    rb, rc = ref_b.ByteTokenizer(), ref_c.CharTokenizer()
    ours_b, ours_c = ByteTokenizer(), CharTokenizer()
    for s in SENTENCES:
        assert ours_b.encode(s, 48) == rb.encode(s, 48), s
        assert ours_c.encode(s, 48) == rc.encode(s, 48), s
        assert ours_b.batch_decode([ours_b.encode(s, 48)]) == rb.batch_decode(
            [rb.encode(s, 48)]
        ), s


def test_bpe_round_trip(tmp_path):
    corpus = SENTENCES * 10
    tok = BPETokenizer(
        data=corpus, step=8, save_path=str(tmp_path / "bpe.json"), max_vocab_size=500
    )
    for s in SENTENCES:
        ids = tok.encode(s, max_length=48)
        assert len(ids) == 48
        assert tok.decode(ids) == s
    # reload from saved vocab gives identical encodings
    tok2 = BPETokenizer(save_path=str(tmp_path / "bpe.json"))
    assert tok2.encode("xin chào", 16) == tok.encode("xin chào", 16)


def test_structured_round_trip(tmp_path):
    ann = {
        "annotations": [
            {"question": "cái gì đây", "answers": [s]} for s in SENTENCES
        ]
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False), encoding="utf-8")
    tok = StructuredPhonemeTokenizer(
        vocab_path=str(tmp_path / "vocab.json"), annotation_paths=[str(ann_path)]
    )
    # specials aligned across components
    for part in ("onset", "rhyme", "tone"):
        assert tok.vocab[part]["<pad>"] == tok.pad_id
        assert tok.vocab[part]["none"] == 0
    for s in SENTENCES:
        triples = tok.encode(s, max_length=40)
        arr = np.asarray(triples)
        assert arr.shape == (40, 3)
        assert tok.decode(arr) == s, s
    # reloading the saved vocab reproduces encodings
    tok2 = StructuredPhonemeTokenizer(vocab_path=str(tmp_path / "vocab.json"))
    assert tok2.encode(SENTENCES[0], 40) == tok.encode(SENTENCES[0], 40)


@needs_reference
def test_vocab_builder_parity(tmp_path):
    ann = {
        "annotations": [
            {"question": "cái gì đây", "answers": [s]} for s in SENTENCES
        ]
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False), encoding="utf-8")
    from .reference_loader import load_reference_package

    ref = load_reference_package("core.tokenizer.modules.vocab_builder")
    theirs = ref.VocabBuilder([str(ann_path)]).vocab
    ours = VocabBuilder([str(ann_path)]).vocab
    assert ours == theirs


def test_fallback_backbone_tokenizer():
    tok = FallbackSubwordTokenizer(vocab_size=5000)
    enc = tok("<pad> xin chào thế giới", padding="max_length", max_length=16, truncation=True)
    assert len(enc["input_ids"]) == 16 and len(enc["attention_mask"]) == 16
    assert enc["input_ids"][-1] == tok.pad_token_id
    # special-token strings in plain text map to their ids, matching HF
    # behavior — the data layer's '"<pad> " + answer' decoder-start
    # convention (data/latr.py) depends on this
    assert enc["input_ids"][0] == tok.pad_token_id
    assert tok("a </s> b", add_special_tokens=False)["input_ids"][1] == tok.eos_token_id
    # word-split OCR encoding (no specials) and per-word ids used for alignment
    words = ["hello", "world", "foobarbazqux"]
    joint = tok(words, is_split_into_words=True, add_special_tokens=False)
    per_word = tok(words, is_split_into_words=False, add_special_tokens=False)
    assert sum(len(x) for x in per_word["input_ids"]) == len(joint["input_ids"])
    # long words split into multiple pieces
    assert len(per_word["input_ids"][2]) > 1
    # decode inverts encode
    assert tok.decode(joint["input_ids"]) == "hello world foobarbazqux"


def test_vocab_builder_inspection_helpers(tmp_path, capsys):
    ann = {"annotations": [{"question": "màu gì", "answers": ["màu đỏ covid"]}]}
    ann_path = tmp_path / "a.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False), encoding="utf-8")
    vb = VocabBuilder([str(ann_path)])
    vb.check_vocab()
    out = capsys.readouterr().out
    assert "Vocabulary Size" in out and "Category: onset" in out
    vb.find_word_source("rhyme", "au")
    out = capsys.readouterr().out
    assert "màu" in out
    vb.find_word_source("onset", "zzz")
    assert "not found" in capsys.readouterr().out
