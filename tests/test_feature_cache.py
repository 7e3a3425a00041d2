"""FEATURE_CACHE: on-disk featurization cache (data/feature_cache.py).

A hit must reproduce the exact packed arrays the eager pass builds (and the
exact end-to-end answers); a changed dataframe, parameter, or tokenizer must
miss; corrupt entries rebuild instead of crashing.
"""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from phoneme_vqa_tpu.data import feature_cache
from phoneme_vqa_tpu.data.feature_cache import (
    compute_key,
    df_fingerprint,
    get_or_build,
    tokenizer_tag,
)


def _df(n=4, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "image_id": np.arange(n),
            "question": [f"what is {i}?" for i in range(n)],
            "answer": [f"answer {rng.randint(10)}" for _ in range(n)],
            "texts": [["hello", "world"]] * n,  # unhashable object column
        }
    )


def test_df_fingerprint_content_keyed():
    a, b = _df(seed=0), _df(seed=0)
    assert df_fingerprint(a) == df_fingerprint(b)  # same content, new object
    c = _df(seed=1)
    assert df_fingerprint(a) != df_fingerprint(c)  # different answers
    d = _df(seed=0)
    d.loc[0, "question"] = "changed"
    assert df_fingerprint(a) != df_fingerprint(d)
    # row order matters (featurization order)
    e = _df(seed=0).iloc[::-1].reset_index(drop=True)
    assert df_fingerprint(a) != df_fingerprint(e)


def test_get_or_build_roundtrip(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return (
            {"x": np.arange(12, dtype=np.int32).reshape(4, 3)},
            [10, 11, 12, 13],
            ["a", "b", "c", "d"],
        )

    parts = {"cls": "T", "df": "abc", "k": 3}
    a1, ids1, ans1 = get_or_build(str(tmp_path), parts, build)
    a2, ids2, ans2 = get_or_build(str(tmp_path), parts, build)
    assert len(calls) == 1, "second call must hit the cache"
    np.testing.assert_array_equal(np.asarray(a2["x"]), a1["x"])
    assert list(ids2) == ids1 and list(ans2) == ans1
    # different parts -> miss
    get_or_build(str(tmp_path), {**parts, "k": 4}, build)
    assert len(calls) == 2
    # no cache_dir -> always build
    get_or_build(None, parts, build)
    assert len(calls) == 3


def test_corrupt_entry_rebuilds(tmp_path):
    def build():
        return {"x": np.ones((2, 2), np.int32)}, [1, 2], ["a", "b"]

    parts = {"p": 1}
    get_or_build(str(tmp_path), parts, build)
    key = compute_key(dict(parts, _version=feature_cache.VERSION))
    entry = tmp_path / key
    os.remove(entry / "x.npy")  # corrupt: meta points at a missing array
    arrays, ids, ans = get_or_build(str(tmp_path), parts, build)
    np.testing.assert_array_equal(np.asarray(arrays["x"]), np.ones((2, 2)))


def test_tokenizer_tag_tracks_vocab():
    from phoneme_vqa_tpu.tokenizers.byte import ByteTokenizer

    t = ByteTokenizer()
    assert tokenizer_tag(t) == tokenizer_tag(ByteTokenizer())

    class FakeVocab:
        def get_vocab(self):
            return {"a": 1, "b": 2}

    class FakeVocab2(FakeVocab):
        def get_vocab(self):
            return {"a": 1, "b": 3}

    class FV(FakeVocab):
        pass

    assert tokenizer_tag(FakeVocab()) != tokenizer_tag(FakeVocab2())
    # same class name, same vocab -> same tag path (class + hash)
    assert tokenizer_tag(FakeVocab()) == tokenizer_tag(FakeVocab())


def test_latr_dataset_cache_hit_is_array_equal(tmp_path):
    """The cached LaTrDataset reproduces the eager arrays element-for-element
    and builds exactly once."""
    from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
    from phoneme_vqa_tpu.data.latr import LaTrDataset
    from phoneme_vqa_tpu.tokenizers.backbone import FallbackSubwordTokenizer

    from .fixtures import make_latr_fixture

    paths = make_latr_fixture(tmp_path)
    qa_df = pd.read_csv(paths["train"])[
        ["image_id", "question", "answer", "filename"]
    ]
    ocr_df = textlayout_ocr_adapt(paths["ocr"])
    tok = FallbackSubwordTokenizer(vocab_size=512)
    kw = dict(
        qa_df=qa_df, ocr_df=ocr_df, tokenizer=tok,
        base_img_path=paths["img"], max_ocr_element=8, max_ocr_length=10,
        max_input_length=12, max_output_length=8,
    )
    cache = str(tmp_path / "fc")
    eager = LaTrDataset(**kw).dataset
    miss = LaTrDataset(**kw, cache_dir=cache).dataset  # writes
    hit = LaTrDataset(**kw, cache_dir=cache).dataset  # reads (mmap)
    for k in eager.arrays:
        np.testing.assert_array_equal(np.asarray(hit.arrays[k]), eager.arrays[k])
        np.testing.assert_array_equal(np.asarray(miss.arrays[k]), eager.arrays[k])
    assert [str(i) for i in hit.image_ids] == [str(i) for i in eager.image_ids]
    assert list(hit.answers) == [str(a) for a in eager.answers]
    # lazy pixel loads still work off the cached dataset
    px = hit.gather(np.array([0, 1]))["pixel_values"]
    assert px.shape[0] == 2
    # exactly one cache entry was created
    entries = [d for d in os.listdir(cache) if not d.startswith(".")]
    assert len(entries) == 1


@pytest.mark.slow
def test_feature_cache_through_run_arc(tmp_path):
    """FEATURE_CACHE through the real executor: train twice with the knob —
    the second construction hits the cache and the eval answers are
    unchanged vs an uncached run."""
    from phoneme_vqa_tpu import registry_setup  # noqa: F401
    from phoneme_vqa_tpu.config import get_config
    from phoneme_vqa_tpu.utils.registry import EXECUTORS

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    cache = str(tmp_path / "fc")
    yaml_c = tiny_latr_yaml(paths, str(tmp_path / "ck1"), NUM_EPOCHS=1,
                            FEATURE_CACHE=cache)
    ex1 = EXECUTORS.get("LaTr_Executor")(get_config(yaml_c), mode="train")
    ex1.run()
    assert os.path.isdir(cache) and len(os.listdir(cache)) >= 1
    n_entries = len(os.listdir(cache))
    # second run: same data -> no new entries, same dataset contents
    ex2 = EXECUTORS.get("LaTr_Executor")(get_config(yaml_c), mode="train")
    assert len(os.listdir(cache)) == n_entries
    for k in ex1.train_data.arrays:
        np.testing.assert_array_equal(
            np.asarray(ex2.train_data.arrays[k]), np.asarray(ex1.train_data.arrays[k])
        )


def test_sal_dataset_cache_roundtrip(tmp_path):
    """SaL: packed word-id alignment survives the cache; lazy det/rec and
    region feature gathers are identical on hit."""
    from phoneme_vqa_tpu.data.adapters import (
        textlayout_obj_adapt,
        textlayout_ocr_adapt,
    )
    from phoneme_vqa_tpu.data.sal import SaLDataset
    from phoneme_vqa_tpu.tokenizers.backbone import FallbackSubwordTokenizer

    from .fixtures import make_sal_fixture

    paths = make_sal_fixture(tmp_path)
    qa_df = pd.read_csv(paths["train"])[
        ["image_id", "question", "answer", "filename"]
    ]
    ocr_df = textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1)
    obj_df = textlayout_obj_adapt(paths["obj_features"], h_scale=1, w_scale=1)
    tok = FallbackSubwordTokenizer(vocab_size=512)
    kw = dict(
        qa_df=qa_df, ocr_df=ocr_df, obj_df=obj_df, tokenizer=tok,
        base_ocr_feature_path=paths["ocr_features"],
        base_obj_feature_path=paths["obj_features"],
        ocr_hidden=512, obj_hidden=64, max_ocr_element=6, max_ocr_length=12,
        max_obj_element=4, max_obj_length=8, max_input_length=8,
        max_output_length=10,
    )
    cache = str(tmp_path / "fc")
    eager = SaLDataset(**kw)
    SaLDataset(**kw, cache_dir=cache)
    hit = SaLDataset(**kw, cache_dir=cache)
    for k in eager.dataset.arrays:
        np.testing.assert_array_equal(
            np.asarray(hit.dataset.arrays[k]), eager.dataset.arrays[k]
        )
    idx = np.arange(min(3, len(eager.dataset)))
    be, bh = eager.dataset.gather(idx), hit.dataset.gather(idx)
    np.testing.assert_array_equal(bh["ocr_features"], be["ocr_features"])
    np.testing.assert_array_equal(bh["obj_features"], be["obj_features"])


def test_adapted_frame_cache(tmp_path):
    """The OCR/OBJ store adaptation cache: hit returns the identical frame
    without re-reading the .npy pickles; touching a file invalidates."""
    import time

    from phoneme_vqa_tpu.data.adapters import (
        textlayout_obj_adapt,
        textlayout_ocr_adapt,
    )

    from .fixtures import make_sal_fixture

    paths = make_sal_fixture(tmp_path)
    cache = str(tmp_path / "fc")
    a = textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1)
    b = textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1,
                             cache_dir=cache)  # miss -> writes
    c = textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1,
                             cache_dir=cache)  # hit
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    entries = [f for f in os.listdir(cache) if f.startswith("adapt_")]
    assert len(entries) == 1
    # different scales -> different entry
    textlayout_ocr_adapt(paths["ocr_features"], cache_dir=cache)
    assert len([f for f in os.listdir(cache) if f.startswith("adapt_")]) == 2
    # obj adapter caches too
    o1 = textlayout_obj_adapt(paths["obj_features"], cache_dir=cache)
    o2 = textlayout_obj_adapt(paths["obj_features"], cache_dir=cache)
    pd.testing.assert_frame_equal(o1, o2)
    # touching a store file invalidates (mtime-keyed)
    victim = os.path.join(paths["ocr_features"],
                          sorted(os.listdir(paths["ocr_features"]))[0])
    future = time.time() + 10
    os.utime(victim, (future, future))
    textlayout_ocr_adapt(paths["ocr_features"], h_scale=1, w_scale=1,
                         cache_dir=cache)
    assert len([f for f in os.listdir(cache) if f.startswith("adapt_")]) == 4
