"""Serving-side frozen-ViT encoding cache (VIT_CACHE in serve mode).

Identity gates run in f32 (repo-wide caveat: bf16 near-tie argmaxes can flip
under different-but-valid reduction orders)."""

from types import SimpleNamespace

import pandas as pd
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
from phoneme_vqa_tpu.serving import ContinuousEngine, ServingEngine
from phoneme_vqa_tpu.serving.encoding_cache import EncodingCache
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml


@pytest.fixture(scope="module")
def cached(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_vitcache")
    paths = make_latr_fixture(tmp)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10,
        DTYPE="float32", VIT_CACHE=True,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"])
    return ex, ocr_df, qa


def test_gathered_engine_cached_answers_match(cached):
    """Engine answers with the encoding cache on == direct uncached infer
    (the exactness invariant at the serving boundary), and the table dedups:
    repeat images are hits, entries == unique images."""
    ex, ocr_df, qa = cached
    want = ex.infer(ex.val_data, 4, 10)  # uncached: pixels through the ViT
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        assert eng._enc_cache is not None
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=120) for f in futs]
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got2 = [f.result(timeout=120) for f in futs]
        s = eng.stats()["vit_cache"]
    assert got == want and got2 == want
    uniq = qa["image_id"].nunique()
    # warmup encodes one image; every other first-sight is a miss, every
    # repeat (and the whole second round) is a hit
    assert s["entries"] == uniq
    assert s["misses"] == uniq
    assert s["hits"] == 2 * len(qa) - uniq + 1  # +1: the warmup row repeats
    assert s["bytes"] > 0


def test_continuous_engine_cached_answers_match(cached):
    ex, ocr_df, qa = cached
    want = ex.infer(ex.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        assert eng._enc_cache is not None
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
        s = eng.stats()["vit_cache"]
    assert got == want
    assert s["entries"] == qa["image_id"].nunique()
    assert s["hits"] > 0


def test_flush_then_reapply(cached):
    """flush drops every entry (the weight-reload path); the next apply
    re-encodes from the current weights."""
    ex, ocr_df, qa = cached
    cache = EncodingCache.maybe_build(ex)
    assert cache is not None

    def featurize(rows):
        df = qa.iloc[rows].copy()
        df["answer"] = ""
        return ex._make_dataset(df, ocr_df)

    ds = featurize([0, 1, 2])
    cache.apply(ds, [str(i) for i in qa["image_id"][:3]])
    assert "vit_encodings" in ds.arrays and "pixel_values" not in ds.lazy_fields
    n = cache.stats()["entries"]
    assert n > 0
    cache.flush()
    s = cache.stats()
    assert s["entries"] == 0 and s["bytes"] == 0
    ds2 = featurize([0, 1, 2])
    cache.apply(ds2, [str(i) for i in qa["image_id"][:3]])
    assert cache.stats()["entries"] == n
    import numpy as np

    np.testing.assert_array_equal(ds.arrays["vit_encodings"],
                                  ds2.arrays["vit_encodings"])


def test_lru_eviction_under_byte_cap(cached):
    ex, ocr_df, qa = cached
    cache = EncodingCache.maybe_build(ex)
    df = qa.drop_duplicates("image_id").copy()
    df["answer"] = ""
    ds = ex._make_dataset(df, ocr_df)
    ids = [str(i) for i in df["image_id"]]
    cache.apply(ds, ids)
    one = ds.arrays["vit_encodings"][0].nbytes
    # cap below the full set: the oldest entries are evicted, output intact
    cache.max_bytes = one
    ds2 = ex._make_dataset(df, ocr_df)
    cache.apply(ds2, ids)
    s = cache.stats()
    assert s["entries"] == 1 and s["bytes"] == one
    import numpy as np

    np.testing.assert_array_equal(ds.arrays["vit_encodings"],
                                  ds2.arrays["vit_encodings"])


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def test_gating(cached):
    """Off by default; refused without an image encoder; refused when a
    serving adapter targets the ViT."""
    ex, _, _ = cached
    assert EncodingCache.maybe_build(SimpleNamespace(config=None)) is None
    off = SimpleNamespace(config=_Cfg(VIT_CACHE=False))
    assert EncodingCache.maybe_build(off) is None
    no_vit = SimpleNamespace(
        config=_Cfg(VIT_CACHE=True, MODEL_CLASS="SaL"),
        model_config=SimpleNamespace(vit=None),
    )
    assert EncodingCache.maybe_build(no_vit) is None
    adapters = {"x": {"lora": {"vit": {}}}}
    assert EncodingCache.maybe_build(ex, adapters) is None
    assert EncodingCache.maybe_build(ex, {"y": {"lora": {"t5": {}}}}) is not None
