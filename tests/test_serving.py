"""Serving engine: dynamic batching over the production decode path."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
from phoneme_vqa_tpu.serving import ServingEngine
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import make_latr_fixture, tiny_latr_yaml


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    paths = make_latr_fixture(tmp)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    return ex, ocr_df, config, paths


def test_engine_matches_direct_infer(served):
    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=120) for f in futs]
    # direct production path on the same rows
    want = ex.infer(ex.val_data, 4, 10)
    assert got == want
    assert len(got) == len(qa)


def test_engine_with_spec_decode_matches_plain(served, tmp_path_factory):
    """SPEC_DECODE flows through executor.infer into serving and answers are
    identical to the plain-greedy engine (the exactness invariant, at the
    serving boundary)."""
    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    tmp = tmp_path_factory.mktemp("serve_spec")
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, SPEC_DECODE=3,
    )
    spec_cfg = get_config(yaml_path)
    ex_spec = EXECUTORS.get(spec_cfg.EXECUTOR)(spec_cfg, mode="eval")
    # same random init: SEED matches, so params are identical trees
    import jax
    import numpy as np

    for a, b in zip(jax.tree.leaves(ex._ensure_params()),
                    jax.tree.leaves(ex_spec._ensure_params())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with ServingEngine(ex_spec, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=120) for f in futs]
    want = ex.infer(ex.val_data, 4, 10)
    assert got == want


def test_engine_partial_batch_flush_and_reuse(served):
    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    row = next(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=8, max_wait_ms=1,
                       max_answer_length=10) as eng:
        # lone request: flushed by timeout despite batch_size 8
        first = eng.answer(row.image_id, row.question, timeout=120)
        # engine stays serviceable across batches
        second = eng.answer(row.image_id, row.question, timeout=120)
    assert first == second
    assert isinstance(first, str)


def test_engine_rejects_unknown_image(served):
    ex, ocr_df, config, paths = served
    with ServingEngine(ex, ocr_df, batch_size=2, max_wait_ms=1) as eng:
        with pytest.raises(KeyError):
            eng.submit("no-such-image", "câu hỏi?")
        with pytest.raises(RuntimeError):
            eng.stop() or eng.submit(next(iter(eng._known_ids)), "q")


def test_serve_mode_executor_and_id_coercion(served):
    """mode='serve' builds tokenizers + feature stores without reading any
    QA CSV; JSON-style string image ids coerce to the store's key dtype."""
    ex_eval, ocr_df, config, paths = served
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    assert not hasattr(ex, "val_data")
    s_ocr, s_obj = ex.serve_frames
    assert s_obj is None and set(s_ocr["image_id"]) == set(ocr_df["image_id"])
    qa = pd.read_csv(paths["val"])
    row = next(qa.itertuples())
    with ServingEngine(ex, s_ocr, batch_size=2, max_wait_ms=1,
                       max_answer_length=10) as eng:
        # image ids in the store are floats; a JSON client naturally sends
        # the string or int form — both must resolve
        got = eng.answer(str(row.image_id), row.question, timeout=120)
    want = ex_eval.infer(ex_eval.val_data, 4, 10)[0]
    assert got == want


def test_cancelled_future_does_not_kill_worker(served):
    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    row = next(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=2, max_wait_ms=50,
                       max_answer_length=10, warmup=False) as eng:
        f = eng.submit(row.image_id, row.question)
        f.cancel()  # may or may not win the race with the worker claim
        # either way the worker must survive and keep serving
        assert isinstance(eng.answer(row.image_id, row.question, timeout=120), str)


@pytest.mark.slow
def test_engine_over_device_mesh_matches_single(served, tmp_path):
    """Serving rides the executor's mesh sharding unchanged: a DP x TP
    (4 x 2) engine answers identically to the single-device one."""
    ex1, ocr_df, config, paths = served
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, MESH={"data": 4, "model": 2},
    )
    mesh_config = get_config(yaml_path)
    ex8 = EXECUTORS.get(mesh_config.EXECUTOR)(mesh_config, mode="eval")
    ex8.state = ex8.state.replace(params=ex1.state.params)
    ex8._place_state()
    qa = pd.read_csv(paths["val"])
    with ServingEngine(ex8, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex1.infer(ex1.val_data, 4, 10)


def test_admission_edge_cases():
    """Int-store truncation is rejected (int64(3.7) must not answer for
    image 3); empty feature stores fail loudly at construction; SaL admission
    intersects OCR and object stores."""
    import numpy as np

    class _Stub:
        def _make_dataset(self, qa, ocr, obj=None):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return ["ans"] * len(ds)

    int_store = pd.DataFrame({"image_id": np.array([1, 2], dtype=np.int64)})
    with ServingEngine(_Stub(), int_store, batch_size=1, max_wait_ms=1,
                       warmup=False) as eng:
        with pytest.raises(KeyError):
            eng.submit(1.7, "q")  # would truncate to 1 — must reject
        assert eng.answer("2", "q", timeout=30) == "ans"  # lossless coercion

    with pytest.raises(ValueError, match="empty"):
        ServingEngine(_Stub(), pd.DataFrame({"image_id": []}), warmup=False)

    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    obj = pd.DataFrame({"image_id": [2.0, 3.0]})
    with ServingEngine(_Stub(), ocr, obj, batch_size=1, max_wait_ms=1,
                       warmup=False) as eng:
        with pytest.raises(KeyError):
            eng.submit(1.0, "q")  # in OCR but not in the object store
        assert eng.answer(2.0, "q", timeout=30) == "ans"


def test_latency_buckets_match_direct_infer(served, tmp_path):
    """Bucketed engine answers == the single-shape production path, and a
    lone request decodes at the smallest compiled bucket. Pinned to a
    1-device mesh: under the 8-device conftest the default mesh's data
    axis would round every bucket up to the full shape."""
    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    want = ex.infer(ex.val_data, 4, 10)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, MESH={"data": 1},
    )
    ex1 = EXECUTORS.get(config.EXECUTOR)(get_config(yaml_path), mode="eval")
    ex1.state = ex1.state.replace(params=ex.state.params)
    ex1._place_state()
    with ServingEngine(ex1, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10, buckets=[1, 2]) as eng:
        assert eng.buckets == [1, 2, 4]
        row = next(qa.itertuples())
        lone = eng.answer(row.image_id, row.question, timeout=120)
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=120) for f in futs]
        s = eng.stats()
    assert lone == want[0]
    assert got == want
    # the lone request rode the B=1 executable, the burst a bigger one
    assert s["bucket_batches"].get("1") >= 1
    assert sum(s["bucket_batches"].values()) == s["batches"]


def test_bucket_resolution_respects_mesh():
    """Bucket sizes round up to the data axis (never trip the replicated-
    sharding fallback), dedupe, and always end at batch_size."""

    class _Stub:
        mesh = type("M", (), {"shape": {"data": 2, "model": 1}})()

        def __init__(self):
            self.calls = []

        def _make_dataset(self, qa, ocr, obj=None):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            self.calls.append((len(ds), bs))
            return ["ans"] * len(ds)

    stub = _Stub()
    store = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(stub, store, batch_size=8, max_wait_ms=1,
                       warmup=False, buckets=[1, 3, 99]) as eng:
        assert eng.buckets == [2, 4, 8]
        assert eng.answer(1.0, "q", timeout=30) == "ans"
    assert stub.calls == [(1, 2)]  # lone request → smallest (rounded) bucket

    with pytest.raises(ValueError, match="positive"):
        ServingEngine(stub, store, warmup=False, buckets=[0])


def test_serve_mode_requires_trained_bpe_vocab(tmp_path):
    """BPE serving must load the persisted vocab — a missing vocab file is a
    hard error, never a silent empty-corpus training run."""
    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="BPE_Tokenizer", num_decoder_layers=2, n_head=4,
        vocab_save_path=str(tmp_path / "bpevocab.json"),
    )
    config = get_config(yaml_path)
    with pytest.raises(FileNotFoundError, match="BPE vocab"):
        EXECUTORS.get(config.EXECUTOR)(config, mode="serve")


@pytest.mark.slow
def test_customized_bpe_serves_after_training(tmp_path):
    """The full production arc for a Customized family: train (which builds
    and persists the BPE answer vocab + best checkpoint), then serve-mode
    startup loads both and the engine answers like eval infer."""
    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=True,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="BPE_Tokenizer", num_decoder_layers=2, n_head=4,
        vocab_save_path=str(tmp_path / "bpevocab.json"), max_eval_length=10,
    )
    config = get_config(yaml_path)
    EXECUTORS.get(config.EXECUTOR)(config, mode="train").run()

    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ex._load_trained_checkpoint("best")
    ex._place_state()
    ocr_df, _ = ex.serve_frames
    qa = pd.read_csv(paths["val"])
    row = next(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=5,
                       max_answer_length=10) as eng:
        got = eng.answer(row.image_id, row.question, timeout=240)

    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval._load_trained_checkpoint("best")
    ex_eval._place_state()
    assert got == ex_eval.infer(ex_eval.val_data, 4, 10)[0]


@pytest.mark.slow
def test_beam_search_serves(tmp_path):
    """Beam decode (isgreedy: false, num_beam: 2) rides through the engine
    unchanged for the custom-decoder families."""
    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        isgreedy=False, num_beam=2, max_eval_length=10, max_a_length=16,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, _ = ex.serve_frames
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    rows = list(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex_eval.infer(ex_eval.val_data, 4, 10)


@pytest.mark.slow
def test_phoneme_latr_triple_serves(tmp_path):
    """The flagship triple-stream phoneme decode serves: structured tokenizer
    built from vocab/annotations in serve mode, (onset, rhyme, tone) greedy
    through the engine, compose_word detokenization, answers == eval infer."""
    import json as _json

    from .fixtures import ANSWERS, QUESTIONS, make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    ann_path = str(tmp_path / "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        _json.dump(ann, f, ensure_ascii=False)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path], num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, max_a_length=16, isgreedy=True, num_beam=1,
        max_eval_length=10,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, _ = ex.serve_frames
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    rows = list(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex_eval.infer(ex_eval.val_data, 4, 10)


@pytest.mark.slow
def test_phoneme_sal_serves(tmp_path):
    """Phoneme-family serving: serve mode builds the flat phoneme tokenizer
    without any corpus, and engine answers (compose_word detokenized) match
    eval infer."""
    from .fixtures import make_sal_fixture, tiny_sal_yaml

    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="PhonemeSaL_Executor", MODEL_CLASS="PhonemeSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        num_decoder_layers=2, n_head=4, max_eval_length=10, max_a_length=24,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, obj_df = ex.serve_frames
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    rows = list(qa.itertuples())
    with ServingEngine(ex, ocr_df, obj_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex_eval.infer(ex_eval.val_data, 4, 10)


def test_answer_cache():
    """cache_size memoizes repeats (decode is deterministic, weights fixed):
    second identical request resolves without a device batch; LRU evicts."""
    import time

    calls = []

    class _Stub:
        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            calls.append(len(ds))
            return [f"ans{len(calls)}-{i}" for i in range(len(ds))]

    ocr = pd.DataFrame({"image_id": [1.0, 2.0, 3.0]})
    with ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False, cache_size=2) as eng:
        a1 = eng.answer(1.0, "q", timeout=30)
        assert eng.answer(1.0, "q", timeout=30) == a1  # hit
        assert len(calls) == 1
        assert eng.stats()["cache_hits"] == 1
        # string-coerced id hits the same cache entry
        assert eng.answer("1", "q", timeout=30) == a1
        assert len(calls) == 1
        # fill beyond cache_size: entry for (1.0, 'q') evicts (LRU)
        eng.answer(2.0, "q", timeout=30)
        eng.answer(3.0, "q", timeout=30)
        n = len(calls)
        eng.answer(1.0, "q", timeout=30)
        assert len(calls) == n + 1  # was evicted, re-decoded


def test_stopped_engine_rejects_cached_requests():
    """Admission is uniform after stop(): a cache HIT must also raise, not
    keep answering from the LRU (ADVICE r2)."""

    class _Stub:
        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return ["a" for _ in ds]

    ocr = pd.DataFrame({"image_id": [1.0]})
    eng = ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                        warmup=False, cache_size=4)
    assert eng.answer(1.0, "q", timeout=30) == "a"
    assert eng.answer(1.0, "q", timeout=30) == "a"  # now cached
    eng.stop()
    with pytest.raises(RuntimeError, match="engine stopped"):
        eng.submit(1.0, "q")


def test_access_log_records():
    """Structured access log: every admission outcome (ok / cached / error /
    expired) emits one record with submit->resolution latency; question text
    is never logged; a raising sink is disabled, never kills serving."""
    import time

    class _Stub:
        def _make_dataset(self, qa, ocr):
            if qa["question"].iloc[0] == "boom":
                raise RuntimeError("featurization exploded")
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            time.sleep(0.1)
            return ["xin chào"] * len(ds)

    records = []
    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False, cache_size=4,
                       access_log=records.append) as eng:
        assert eng.answer(1.0, "câu hỏi?", timeout=30) == "xin chào"
        eng.answer(1.0, "câu hỏi?", timeout=30)  # cache hit
        with pytest.raises(RuntimeError):
            eng.answer(2.0, "boom", timeout=30)
        # expired-in-queue: the worker is busy with f1 while f2's deadline
        # (10 ms) passes; it must be shed, not decoded
        f1 = eng.submit(1.0, "slow")
        time.sleep(0.02)
        f2 = eng.submit(2.0, "q", deadline_s=0.01)
        assert f1.result(timeout=30) == "xin chào"
        with pytest.raises(TimeoutError):
            f2.result(timeout=30)
    by_status: dict = {}
    for r in records:  # first record per status ("slow" is a second ok)
        by_status.setdefault(r["status"], r)
    assert set(by_status) == {"ok", "cached", "error", "expired"}
    ok = by_status["ok"]
    assert ok["image_id"] == 1.0 and isinstance(ok["image_id"], float)  # .item()
    assert ok["question_chars"] == len("câu hỏi?") and "question" not in ok
    assert ok["bucket"] == 1 and ok["answer_chars"] == len("xin chào")
    assert ok["latency_ms"] >= 100  # infer sleeps 100 ms
    assert by_status["cached"]["latency_ms"] < 100
    assert "featurization exploded" in by_status["error"]["error"]
    assert by_status["expired"]["adapter"] is None
    assert all(isinstance(r["ts"], float) for r in records)
    # every record is JSON-serializable as-is (serve.py writes them verbatim)
    json.dumps(records)

    class _Boom:
        def __call__(self, rec):
            raise ValueError("sink died")

    with ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False, access_log=_Boom()) as eng:
        assert eng.answer(1.0, "q", timeout=30) == "xin chào"  # still serves
        assert eng._access_log is None  # disabled after one failure
        assert eng.answer(1.0, "q2", timeout=30) == "xin chào"


def test_stats_and_backpressure():
    """Stub executor: stats track served requests and latency percentiles;
    max_queue bounds admission with a loud error instead of unbounded
    accumulation."""
    import time

    class _Stub:
        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            time.sleep(0.15)
            return ["ans"] * len(ds)

    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(_Stub(), ocr, batch_size=2, max_wait_ms=1,
                       warmup=False, max_queue=1) as eng:
        f1 = eng.submit(1.0, "q1")  # worker claims it, sleeps 150 ms
        time.sleep(0.05)
        f2 = eng.submit(2.0, "q2")  # fills the 1-slot queue
        with pytest.raises(RuntimeError, match="queue full"):
            eng.submit(1.0, "q3")
        assert f1.result(timeout=10) == "ans" and f2.result(timeout=10) == "ans"
    s = eng.stats()
    assert s["served"] == 2 and s["failed"] == 0 and s["batches"] == 2
    assert s["p50_ms"] is not None and s["p95_ms"] >= s["p50_ms"]


def test_max_queue_auto_derivation_and_starvation_warning(caplog):
    """max_queue=-1 derives 4x batch_size; an explicit bound below 2x batch
    starves the batcher (partial decodes, goodput collapse) and must warn
    loudly; 0 stays unbounded."""

    class _Stub:
        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return ["ans"] * len(ds)

    ocr = pd.DataFrame({"image_id": [1.0]})
    with ServingEngine(_Stub(), ocr, batch_size=16, warmup=False,
                       max_queue=-1) as eng:
        assert eng.max_queue == 64 and eng._queue.maxsize == 64
    with ServingEngine(_Stub(), ocr, batch_size=16, warmup=False,
                       max_queue=0) as eng:
        assert eng.max_queue == 0  # unbounded
    import logging

    with caplog.at_level(logging.WARNING):
        with ServingEngine(_Stub(), ocr, batch_size=16, warmup=False,
                           max_queue=8) as eng:
            assert eng.max_queue == 8  # honored, but warned
    assert any("STARVES the batcher" in r.message for r in caplog.records)


@pytest.mark.slow
def test_sal_family_serves_with_object_store(tmp_path):
    """The engine is family-generic: a SaL serve-mode executor (OCR + object
    feature stores, 2D bias encoder) answers identically to its eval infer."""
    from .fixtures import make_sal_fixture, tiny_sal_yaml

    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10,
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, obj_df = ex.serve_frames
    assert obj_df is not None
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    with ServingEngine(ex, ocr_df, obj_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex_eval.infer(ex_eval.val_data, 4, 10)


def test_http_server_round_trip(served):
    """HTTP front-end: POST /answer batches through the engine; /stats and
    /healthz respond; unknown images 404; bad JSON 400."""
    import threading
    import urllib.error
    import urllib.request

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import serve as serve_mod

    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    rows = list(qa.itertuples())
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        srv = serve_mod.make_http_server(eng, 0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_port}"
        try:
            post = lambda obj: json.loads(
                urllib.request.urlopen(
                    urllib.request.Request(
                        base + "/answer", json.dumps(obj).encode(),
                        {"Content-Type": "application/json"},
                    ),
                    timeout=120,
                ).read()
            )
            # concurrent posts batch through the engine
            results = [None] * len(rows)

            def worker(i, r):
                results[i] = post({"image_id": r.image_id, "question": r.question})

            threads = [
                threading.Thread(target=worker, args=(i, r))
                for i, r in enumerate(rows)
            ]
            [x.start() for x in threads]
            [x.join(timeout=240) for x in threads]
            want = ex.infer(ex.val_data, 4, 10)
            assert [r["answer"] for r in results] == want

            health = json.loads(urllib.request.urlopen(base + "/healthz").read())
            assert health == {"ok": True}
            stats = json.loads(urllib.request.urlopen(base + "/stats").read())
            assert stats["served"] >= len(rows)

            with pytest.raises(urllib.error.HTTPError) as ei:
                post({"image_id": "no-such", "question": "q"})
            assert ei.value.code == 404
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(
                    urllib.request.Request(base + "/answer", b"not json"),
                    timeout=30,
                )
            assert ei.value.code == 400
            with pytest.raises(urllib.error.HTTPError) as ei:
                post({"question": "missing image_id"})
            assert ei.value.code == 400
        finally:
            srv.shutdown()


@pytest.mark.slow
def test_http_sigterm_graceful_shutdown(tmp_path):
    """SIGTERM drains and exits 0 — the shutdown a process manager expects."""
    import signal
    import socket
    import subprocess
    import time
    import urllib.request

    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10
    )
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "serve.py"),
         "--config-file", yaml_path, "--ckpt", "none", "--http", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                r = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5
                )
                assert json.loads(r.read()) == {"ok": True}
                break
            except Exception:
                time.sleep(1.0)
        else:
            raise AssertionError("server never became healthy")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        assert rc == 0, proc.stderr.read()[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_serve_cli_round_trip(tmp_path):
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10
    )
    qa = pd.read_csv(paths["val"])
    lines = "".join(
        json.dumps({"id": i, "image_id": r.image_id, "question": r.question})
        + "\n"
        for i, r in enumerate(qa.itertuples())
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    access_log = str(tmp_path / "access.jsonl")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "serve.py"),
         "--config-file", yaml_path, "--ckpt", "none",
         "--batch-size", "4", "--max-wait-ms", "5",
         "--access-log", access_log],
        input=lines, capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = [json.loads(l) for l in r.stdout.strip().splitlines() if l.strip()]
    assert {o["id"] for o in out} == set(range(len(qa)))
    assert all("answer" in o for o in out), out
    recs = [json.loads(l) for l in open(access_log, encoding="utf-8")]
    assert len(recs) == len(qa)
    assert all(rec["status"] == "ok" and rec["latency_ms"] > 0 for rec in recs)
    assert sorted(rec["image_id"] for rec in recs) == sorted(qa["image_id"])


@pytest.mark.slow
def test_serve_prime_exits_clean(tmp_path):
    """`serve.py --prime` warms the serve executable (into the persistent
    compilation cache) and exits 0 — the bake step for cache-primed
    container images (docs/SERVING.md cold-start story)."""
    import subprocess
    import sys

    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        COMPILE_CACHE_DIR=str(tmp_path / "cache"), max_eval_length=10,
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "serve.py"),
         "--config-file", yaml_path, "--ckpt", "none", "--prime"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "primed (serve executable compiled" in (r.stdout + r.stderr)


def test_hot_reload_stub():
    """engine.reload(): swaps weights between batches with no downtime —
    new answers after the swap, the LRU cache is cleared (stale under new
    weights), and the reloads stat counts."""
    class _Stub:
        version = 1

        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return [f"v{self.version}-{i}" for i in range(len(ds))]

        def _load_trained_checkpoint(self, loadtype):
            assert loadtype in ("best", "last")
            self.version += 1

    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False, cache_size=8) as eng:
        assert eng.answer(1.0, "q", timeout=30) == "v1-0"
        assert eng.answer(1.0, "q", timeout=30) == "v1-0"  # cached
        info = eng.reload("best")
        assert info["reloaded"] == "best" and info["ms"] >= 0
        # cache cleared: the same request re-decodes under the new weights
        assert eng.answer(1.0, "q", timeout=30) == "v2-0"
        assert eng.stats()["reloads"] == 1
    with pytest.raises(RuntimeError, match="engine stopped"):
        eng.reload("best")


def test_reload_watcher_stub(tmp_path):
    """serve.py's --reload-every watcher: a changed checkpoint mtime
    triggers exactly one hot reload."""
    import importlib.util
    import time

    spec = importlib.util.spec_from_file_location(
        "serve_cli", os.path.join(os.path.dirname(__file__), "..", "serve.py")
    )
    serve_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_cli)

    class _Ckpt:
        def __init__(self):
            self._mtime = 100.0

        def mtime(self, name):
            return self._mtime

    class _Stub:
        def __init__(self):
            self.ckpt = _Ckpt()
            self.loads = 0

        def _make_dataset(self, qa, ocr):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return ["a"] * len(ds)

        def _load_trained_checkpoint(self, loadtype):
            self.loads += 1

    ocr = pd.DataFrame({"image_id": [1.0]})
    with ServingEngine(_Stub(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False) as eng:
        serve_cli.start_reload_watcher(eng, "best", every_s=0.05)
        time.sleep(0.2)
        assert eng.stats()["reloads"] == 0  # unchanged mtime: no reload
        eng.executor.ckpt._mtime = 200.0  # trainer wrote a new checkpoint
        deadline = time.monotonic() + 5
        while eng.stats()["reloads"] < 1 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert eng.stats()["reloads"] == 1
        time.sleep(0.2)  # stable mtime afterwards: still exactly one
        assert eng.stats()["reloads"] == 1


@pytest.mark.slow
def test_hot_reload_swaps_real_weights(tmp_path):
    """End to end: serve checkpoint A, overwrite it with different weights,
    reload — answers equal the direct infer under B and the engine never
    stopped."""
    import jax
    import numpy as np

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1, max_eval_length=10)
    config = get_config(yaml_path)
    tr = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tr._save_checkpoint("best")
    tr.ckpt.wait()

    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ev._load_trained_checkpoint("best")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"]).head(4)
    with ServingEngine(ev, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10) as eng:
        before = [eng.answer(r.image_id, r.question, timeout=120)
                  for r in qa.itertuples()]
        # a differently-seeded init saved over best_ckp = new weights
        rng = np.random.RandomState(99)
        new_params = jax.tree.map(
            lambda x: (rng.standard_normal(x.shape) * 0.02).astype(np.float32)
            if hasattr(x, "shape") and x.dtype == np.float32 else x,
            jax.tree.map(np.asarray, tr.state.params),
        )
        tr.state = tr.state.replace(params=new_params)
        tr._save_checkpoint("best")
        tr.ckpt.wait()
        eng.reload("best")
        after = [eng.answer(r.image_id, r.question, timeout=120)
                 for r in qa.itertuples()]
        want = ev.infer(ev.val_data, 4, 10)[: len(qa)]
    assert after == want
    assert eng.stats()["reloads"] == 1


def test_confidence_mode(served):
    """confidence=True resolves to {"answer", "confidence"} dicts; answers
    match the plain engine, confidence is exp(mean emitted-token log-prob)
    in (0, 1], and the executor-level return_scores agrees."""
    import math

    ex, ocr_df, config, paths = served
    qa = pd.read_csv(paths["val"])
    want_ans, want_scores = ex.infer(ex.val_data, 4, 10, return_scores=True)
    assert want_ans == ex.infer(ex.val_data, 4, 10)  # scoring can't change ids
    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=20,
                       max_answer_length=10, confidence=True,
                       cache_size=8) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=120) for f in futs]
        # cached repeat returns the same dict
        row = next(qa.itertuples())
        again = eng.answer(row.image_id, row.question, timeout=120)
    assert [g["answer"] for g in got] == want_ans
    for g, s in zip(got, want_scores):
        assert 0.0 < g["confidence"] <= 1.0
        assert abs(g["confidence"] - math.exp(s)) < 1e-3
    assert again == got[0]
    assert eng.stats()["cache_hits"] == 1


def test_deadline_expiry_and_prometheus_metrics():
    """A request whose deadline passes while queued is shed with
    TimeoutError BEFORE decode (never featurized), counted in stats, and
    exported at /metrics in Prometheus text format."""
    import time as _time

    decoded = []

    class _Slow:
        def _make_dataset(self, qa, ocr, obj=None):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            decoded.append(len(ds))
            _time.sleep(0.4)  # hold the worker so queued deadlines lapse
            return ["ans"] * len(ds)

    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(_Slow(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False) as eng:
        a = eng.submit(1.0, "first")               # occupies the worker
        b = eng.submit(2.0, "doomed", deadline_s=0.05)  # expires in queue
        c = eng.submit(1.0, "patient")             # survives
        assert a.result(timeout=30) == "ans"
        with pytest.raises(TimeoutError, match="deadline"):
            b.result(timeout=30)
        assert c.result(timeout=30) == "ans"
    s = eng.stats()
    assert s["expired"] == 1 and s["served"] == 2
    assert decoded == [1, 1]  # b was shed before featurization/decode
    text = eng.prometheus_metrics()
    assert "phonovqa_expired_total 1" in text
    assert "phonovqa_served_total 2" in text
    assert 'phonovqa_request_latency_ms{quantile="0.5"}' in text
    assert "# TYPE phonovqa_queue_depth gauge" in text


def test_shed_before_batch_viability():
    """A queued request whose REMAINING deadline is under the measured
    service-time EWMA (claim->resolve) is shed at batch formation
    ("deadline cannot be met") instead of burning a batch seat and
    expiring mid-decode; deadline-free traffic is unaffected."""
    import time as _time

    decoded = []

    class _Slow:
        def _make_dataset(self, qa, ocr, obj=None):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            decoded.append(len(ds))
            _time.sleep(0.05)
            return ["ans"] * len(ds)

    ocr = pd.DataFrame({"image_id": [1.0, 2.0]})
    with ServingEngine(_Slow(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False) as eng:
        # one completion seeds the estimate
        assert eng.answer(1.0, "seed", timeout=30) == "ans"
        assert eng.stats()["service_ewma_s"] > 0
        eng._service_ewma = 3600.0  # force: no finite deadline is viable
        doomed = eng.submit(2.0, "doomed", deadline_s=30.0)
        with pytest.raises(TimeoutError, match="cannot be met"):
            doomed.result(timeout=30)
        assert eng.answer(1.0, "free", timeout=30) == "ans"
        s = eng.stats()
        assert s["expired"] == 1 and s["served"] == 2
        assert decoded == [1, 1]  # the doomed request never reached decode
        assert eng._service_ewma < 3600.0  # real completions re-learn it


def test_default_deadline_applies():
    """default_deadline_s stamps every submit; an idle engine still answers
    well inside it (no false expiry)."""

    class _Quick:
        def _make_dataset(self, qa, ocr, obj=None):
            return list(range(len(qa)))

        def infer(self, ds, bs, ml, return_scores=False):
            return ["ok"] * len(ds)

    ocr = pd.DataFrame({"image_id": [1.0]})
    with ServingEngine(_Quick(), ocr, batch_size=1, max_wait_ms=1,
                       warmup=False, default_deadline_s=30) as eng:
        fut = eng.submit(1.0, "q")
        assert fut.result(timeout=30) == "ok"
        assert eng.stats()["expired"] == 0
