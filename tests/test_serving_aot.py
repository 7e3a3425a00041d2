"""AOT executable store: zero-compile serving restarts.

pack() serializes the compiled serve executables; a FRESH executor (new
generate-fn table — what a restarted process has) load()s them and answers
identically without building a single jit fn. A stale/mismatched store must
degrade to the normal jit path, never crash or mis-answer.
"""

import json
import os

import pandas as pd
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
from phoneme_vqa_tpu.serving import ServingEngine
from phoneme_vqa_tpu.serving import aot
from phoneme_vqa_tpu.serving.aot import AotGenerateDispatch
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_compile_cache():
    """These tests serialize/deserialize executables themselves; the test
    tier's persistent compilation cache must not interpose — XLA:CPU
    executables loaded back from the cache carry compile-machine feature
    PREFERENCES (+prefer-no-scatter/gather) the host feature probe lacks,
    and executing them fails (Buffer Definition Event ... not found).

    Nulling jax_compilation_cache_dir alone is NOT enough: once any earlier
    module (test_serving.py, alphabetically first) has compiled with the
    cache on, ``is_cache_used`` has memoized True and ``_get_cache`` keeps
    returning the initialized cache object. Disable via the enable flag and
    reset the memoized state on both edges."""
    import jax
    from jax._src import compilation_cache as cc

    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", prev)
    cc.reset_cache()


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("aot")
    paths = make_latr_fixture(tmp)
    # a 1-device mesh (the serving deployment shape): buckets [1, 4] survive
    # _resolve_buckets' rounding-to-data-axis, exercising a multi-entry store
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10,
        MESH={"data": 1},
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    store = str(tmp / "store")
    with ServingEngine(
        ex, ocr_df, batch_size=4, max_wait_ms=5, max_answer_length=10,
        buckets=[1],
    ) as eng:
        entries = aot.pack(eng, store)
        qa = pd.read_csv(paths["val"])
        want = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    return yaml_path, paths, store, entries, want, ocr_df


def _fresh_executor(yaml_path):
    config = get_config(yaml_path)
    return EXECUTORS.get(config.EXECUTOR)(config, mode="eval")


def test_pack_writes_manifest_and_entries(packed):
    _, _, store, entries, _, _ = packed
    assert {(e["batch_size"], e["max_length"]) for e in entries} == {
        (1, 10), (4, 10),
    }
    with open(os.path.join(store, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["entries"]) == 2
    for e in manifest["entries"]:
        assert os.path.getsize(os.path.join(store, e["file"])) == e["bytes"]
        assert e["bytes"] > 0


def test_load_answers_without_any_jit_build(packed):
    yaml_path, paths, store, _, want, ocr_df = packed
    ex = _fresh_executor(yaml_path)
    loaded = aot.load(ex, store)
    assert len(loaded) == 2
    with ServingEngine(
        ex, ocr_df, batch_size=4, max_wait_ms=5, max_answer_length=10,
        buckets=[1],
    ) as eng:
        qa = pd.read_csv(paths["val"])
        got = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    assert got == want
    # the restart never built a jit fallback: every call rode the store
    disp = ex._generate_fns[(10, False)]
    assert isinstance(disp, AotGenerateDispatch)
    assert disp._fallback is None
    assert all(verified for _, _, verified in disp.loaded.values())


def test_env_mismatch_refuses_store(packed, tmp_path):
    yaml_path, _, store, _, _, _ = packed
    import shutil

    stale = tmp_path / "stale"
    shutil.copytree(store, stale)
    m = json.loads((stale / "manifest.json").read_text())
    m["jax"] = "0.0.0-other"
    (stale / "manifest.json").write_text(json.dumps(m))
    ex = _fresh_executor(yaml_path)
    assert aot.load(ex, str(stale)) == []
    assert ex._generate_fns == {}


def test_missing_store_is_a_clean_miss(packed, tmp_path):
    yaml_path = packed[0]
    ex = _fresh_executor(yaml_path)
    assert aot.load(ex, str(tmp_path / "nowhere")) == []


def test_spmd_pack_load_roundtrip(tmp_path):
    """A serve executable compiled over the full 8-device data-parallel mesh
    serializes and reloads too (multi-chip serving restart)."""
    # own fixture dir: tiny_latr_yaml writes into paths["root"], and reusing
    # the module fixture's paths would overwrite ITS yaml (dropping MESH)
    tmp = tmp_path
    paths = make_latr_fixture(tmp)
    ocr_df = textlayout_ocr_adapt(paths["ocr"])
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck8"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10
    )
    ex = _fresh_executor(yaml_path)
    assert ex.mesh.devices.size == 8
    store = str(tmp / "store8")
    qa = pd.read_csv(paths["val"])
    with ServingEngine(
        ex, ocr_df, batch_size=8, max_wait_ms=5, max_answer_length=10
    ) as eng:
        aot.pack(eng, store)
        want = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    ex2 = _fresh_executor(yaml_path)
    loaded = aot.load(ex2, store)
    assert [e["batch_size"] for e in loaded] == [8]
    with ServingEngine(
        ex2, ocr_df, batch_size=8, max_wait_ms=5, max_answer_length=10
    ) as eng:
        got = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    assert got == want
    disp = ex2._generate_fns[(10, False)]
    assert disp._fallback is None


def test_pack_self_heals_persistent_cache_loaded_executable(tmp_path):
    """Regression (round-5): serve.py runs with the persistent compilation
    cache ON, so pack()'s lower().compile() can return a cache-LOADED
    executable — which on XLA:CPU re-serializes into an AOT blob carrying
    compile-machine tuning preferences (+prefer-no-scatter/gather) that
    loads with a warning but fails at RUN time. pack must catch this via
    its round-trip execute verification and recompile cache-free, so the
    store it writes always works."""
    import jax
    from jax._src import compilation_cache as cc

    paths = make_latr_fixture(tmp_path)
    ocr_df = textlayout_ocr_adapt(paths["ocr"])
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, MESH={"data": 1},
    )
    qa = pd.read_csv(paths["val"])
    eng_kw = dict(batch_size=4, max_wait_ms=5, max_answer_length=10,
                  buckets=[1])
    prev_enable = jax.config.jax_enable_compilation_cache
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "ccache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    cc.reset_cache()
    store = str(tmp_path / "store")
    try:
        ex = _fresh_executor(yaml_path)
        with ServingEngine(ex, ocr_df, **eng_kw) as eng:
            aot.pack(eng, str(tmp_path / "store_discard"))  # populates cache
            want = [
                eng.submit(r.image_id, r.question).result(timeout=120)
                for r in qa.itertuples()
            ]
        # drop in-memory executables: the next lower().compile() must come
        # back as a persistent-cache LOAD — the broken-serialization case
        jax.clear_caches()
        ex2 = _fresh_executor(yaml_path)
        with ServingEngine(ex2, ocr_df, **eng_kw) as eng:
            entries = aot.pack(eng, store)
        assert len(entries) == 2
    finally:
        jax.config.update("jax_enable_compilation_cache", prev_enable)
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        cc.reset_cache()
    ex3 = _fresh_executor(yaml_path)
    loaded = aot.load(ex3, store)
    assert len(loaded) == 2
    with ServingEngine(ex3, ocr_df, **eng_kw) as eng:
        got = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    assert got == want
    disp = ex3._generate_fns[(10, False)]
    assert disp._fallback is None  # the healed store really served every call


def test_signature_mismatch_falls_back_to_jit(packed):
    """A store whose recorded signature doesn't match the live args (e.g. a
    checkpoint at different dims) serves via the jit fallback — same
    answers, one warning, no crash."""
    yaml_path, paths, store, _, want, ocr_df = packed
    ex = _fresh_executor(yaml_path)
    loaded = aot.load(ex, store)
    assert loaded
    disp = ex._generate_fns[(10, False)]
    for ent in disp.loaded.values():  # corrupt every recorded signature
        ent[1] = [("(3, 3)", "float64")] + ent[1][1:]
    with ServingEngine(
        ex, ocr_df, batch_size=4, max_wait_ms=5, max_answer_length=10,
        buckets=[1],
    ) as eng:
        qa = pd.read_csv(paths["val"])
        got = [
            eng.submit(r.image_id, r.question).result(timeout=120)
            for r in qa.itertuples()
        ]
    assert got == want
    assert disp.loaded == {}  # every entry was evicted on first use
    assert disp._fallback is not None  # ... and the jit path took over
