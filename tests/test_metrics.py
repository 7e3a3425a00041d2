"""Metric parity tests vs the reference evaluation package."""

import os

import numpy as np
import pytest

from phoneme_vqa_tpu.evaluation import compute_scores

from .reference_loader import REFERENCE_ROOT, load_reference_package

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not mounted"
)

GTS = {
    "a1": ["quán phở hà nội"],
    "a2": ["màu đỏ", "màu đỏ đậm"],
    "a3": ["7 giờ 30 phút sáng chủ nhật"],
    "a4": ["không"],
    "a5": ["trường đại học bách khoa hà nội"],
    "a6": ["xe máy"],
}
GENS = {
    "a1": ["quán phở hà nội"],          # exact match
    "a2": ["màu đỏ"],                    # matches one of two refs
    "a3": ["7 giờ 30 sáng"],             # partial overlap
    "a4": ["có"],                        # miss
    "a5": ["đại học bách khoa"],         # subsequence
    "a6": [""],                          # empty hypothesis
}


def _assert_close(a, b, path=""):
    if isinstance(a, dict):
        assert a.keys() == b.keys(), path
        for k in a:
            _assert_close(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple, np.ndarray)):
        a = np.asarray(a, dtype=float)
        b = np.asarray(b, dtype=float)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12, err_msg=path)
    else:
        np.testing.assert_allclose(float(a), float(b), rtol=1e-12, err_msg=path)


@needs_reference
def test_compute_scores_parity():
    ref_eval = load_reference_package("evaluation")
    ref_score, ref_scores = ref_eval.compute_scores(GTS, GENS)
    score, scores = compute_scores(GTS, GENS)
    _assert_close(score, ref_score, "corpus")
    _assert_close(scores, ref_scores, "per-sample")


def test_metric_sanity():
    score, scores = compute_scores(GTS, GENS)
    assert score["Accuracy"] == pytest.approx(1 / 6 + 1 / 12)  # a1 exact, a2 half
    assert 0 < score["F1"] < 1
    assert 0 <= score["ROUGE"] <= 1
    assert len(score["BLEU"]) == 4
    assert scores["CIDEr"].shape == (6,)
    # per-sample arrays align with dict insertion order of GENS
    assert scores["Accuracy"][0] == 1.0 and scores["Accuracy"][3] == 0.0


def test_perfect_predictions():
    gts = {k: [v[0]] for k, v in GTS.items()}
    gens = {k: [v[0]] for k, v in gts.items()}
    score, _ = compute_scores(gts, gens)
    assert score["Accuracy"] == 1.0
    assert score["F1"] == 1.0
    assert score["ROUGE"] == 1.0
    assert score["BLEU"][0] > 0.99


@needs_reference
def test_metric_fuzz_parity():
    """Randomized parity over many small corpora (exercises BLEU brevity,
    CIDEr idf/length-penalty, LCS ties, empty strings)."""
    import random

    ref_eval = load_reference_package("evaluation")
    words = ["màu", "đỏ", "xanh", "quán", "7", "giờ", "phở", "a", "bb", ""]
    rng = random.Random(42)
    for trial in range(15):
        n = rng.randint(2, 8)
        gts, gens = {}, {}
        for i in range(n):
            key = f"k{i}"
            gts[key] = [
                " ".join(rng.choices(words, k=rng.randint(1, 6))).strip() or "x"
                for _ in range(rng.randint(1, 2))
            ]
            gens[key] = [" ".join(rng.choices(words, k=rng.randint(0, 6))).strip()]
        want = ref_eval.compute_scores(gts, gens)
        got = compute_scores(gts, gens)
        _assert_close(got[0], want[0], f"trial{trial}.corpus")
        _assert_close(got[1], want[1], f"trial{trial}.per-sample")
