"""Continuous-batching slot engine: answers identical to ``executor.infer``,
mid-stream joins, slot refill, deadline shedding, unsupported-family guard.

The identity gate runs in f32 (the per-row-position step's different
reduction order can flip bf16 near-tie argmaxes — repo-wide caveat).
"""

import time

import numpy as np
import pandas as pd
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
from phoneme_vqa_tpu.serving import ContinuousEngine
from phoneme_vqa_tpu.utils.registry import EXECUTORS

from .fixtures import (
    make_latr_fixture,
    make_sal_fixture,
    tiny_latr_yaml,
    tiny_sal_yaml,
)


@pytest.fixture(scope="module")
def latr(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cont_latr")
    paths = make_latr_fixture(tmp)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10,
        DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"])
    return ex, ocr_df, config, qa


def test_answers_identical_to_infer(latr):
    ex, ocr_df, config, qa = latr
    want = ex.infer(ex.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
        # repeat with slots warm (refill path, not fresh-engine path)
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got2 = [f.result(timeout=300) for f in futs]
    assert got == want
    assert got2 == want
    s = eng.stats()
    assert s["served"] == 2 * len(qa) and s["failed"] == 0
    assert s["decode_dispatches"] >= 2  # 6 reqs through 3 slots = waves
    assert s["p95_ms"] is not None


def test_mid_stream_join(latr):
    """A request submitted while earlier ones are mid-decode must join at a
    step boundary and still answer identically — the whole point of
    continuous batching."""
    ex, ocr_df, config, qa = latr
    rows = list(qa.itertuples())
    want = ex.infer(ex.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, num_slots=4, prefill_chunk=2,
                          horizon=2, max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows[:2]]
        time.sleep(0.05)  # let decode start
        futs += [eng.submit(r.image_id, r.question) for r in rows[2:]]
        got = [f.result(timeout=300) for f in futs]
    assert got == want


@pytest.mark.slow
def test_sal_family_continuous(tmp_path):
    """SaL: 2D-bias encoder + object stream through the slot decode."""
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        max_eval_length=10, DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, obj_df = ex.serve_frames
    assert obj_df is not None
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    want = ex_eval.infer(ex_eval.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, obj_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=600) for f in futs]
    assert got == want


def test_deadline_shedding_and_unknown_id(latr):
    ex, ocr_df, config, qa = latr
    row = next(qa.itertuples())
    with ContinuousEngine(ex, ocr_df, num_slots=2, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        f = eng.submit(row.image_id, row.question, deadline_s=-1.0)
        with pytest.raises(TimeoutError):
            f.result(timeout=60)
        assert eng.stats()["expired"] == 1
        with pytest.raises(KeyError, match="unknown image_id"):
            eng.submit(99999.0, "q")
        # submit is signature-compatible with ServingEngine (the serve.py
        # HTTP handler always passes adapter=): None is accepted, a name
        # is rejected as unknown rather than TypeError-ing the request
        with pytest.raises(KeyError, match="unknown adapter"):
            eng.submit(row.image_id, "q", adapter="x")
        f2 = eng.submit(row.image_id, row.question, adapter=None)
        assert isinstance(f2.result(timeout=120), str)
        # still serves after shedding
        assert isinstance(eng.answer(row.image_id, row.question, timeout=120), str)


def test_shed_before_slot_viability(latr):
    """A queued request whose REMAINING deadline is under the measured
    per-request service time (EWMA of slotted->finished) is shed while
    queued ("deadline cannot be met"), never burning slot steps — the fix
    for the measured round-5 overload collapse where every slotted request
    expired mid-decode. No-deadline traffic is unaffected and keeps the
    EWMA learning."""
    ex, ocr_df, config, qa = latr
    rows = list(qa.itertuples())
    with ContinuousEngine(ex, ocr_df, num_slots=2, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        # one served answer seeds the service-time estimate
        assert isinstance(
            eng.answer(rows[0].image_id, rows[0].question, timeout=300), str
        )
        assert eng.stats()["service_ewma_s"] > 0
        eng._service_ewma = 3600.0  # force: no finite deadline is viable
        f = eng.submit(rows[1].image_id, rows[1].question, deadline_s=30.0)
        with pytest.raises(TimeoutError, match="cannot be met"):
            f.result(timeout=60)
        assert eng.stats()["expired"] == 1
        # viability never rejects deadline-free traffic, and serving it
        # re-learns the estimate from real completions
        assert isinstance(
            eng.answer(rows[1].image_id, rows[1].question, timeout=300), str
        )
        assert eng.stats()["served"] == 2
        assert eng._service_ewma < 3600.0


def test_customized_family_continuous(tmp_path):
    """CustomizedLaTr (custom post-LN decoder, byte answer vocabulary)
    through the slot decode: answers — through the pluggable tokenizer's
    detokenization — identical to ``executor.infer``."""
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, max_a_length=16, max_eval_length=10,
        DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"])
    want = ex.infer(ex.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
    assert got == want


def test_phoneme_latr_continuous(tmp_path):
    """The framework's NAMESAKE decode through its best serving engine:
    PhonemeLaTr's triple stream (onset/rhyme/tone argmaxed per step, row
    stops on onset EOS) slot-decodes to answers — through compose_word
    detokenization — identical to ``executor.infer``, and confidence scores
    match executor-level return_scores."""
    import json
    import math
    import os

    from .fixtures import ANSWERS, QUESTIONS

    paths = make_latr_fixture(tmp_path)
    ann = {
        "annotations": [
            {"question": q, "answers": [a]} for q, a in zip(QUESTIONS, ANSWERS)
        ]
    }
    ann_path = os.path.join(str(tmp_path), "annotations.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump(ann, f, ensure_ascii=False)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="PhonemeLaTr_Executor", MODEL_CLASS="PhonemeLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        vocab_path=str(tmp_path / "phoneme_vocab.json"),
        annotation_paths=[ann_path],
        num_decoder_layers=2, n_head=4, NUM_FREEZE_EPOCH=0,
        max_a_length=16, max_eval_length=10, isgreedy=True, num_beam=1,
        DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"])
    want, want_scores = ex.infer(ex.val_data, 4, 10, return_scores=True)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10,
                          confidence=True) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
    assert [g["answer"] for g in got] == want
    for g, s in zip(got, want_scores):
        assert abs(g["confidence"] - math.exp(s)) < 1e-3
    assert eng.stats()["served"] == len(qa)


@pytest.mark.slow
def test_phoneme_sal_continuous(tmp_path):
    """PhonemeSaL (flat phoneme stream, 2D-bias encoder) slot decode."""
    paths = make_sal_fixture(tmp_path)
    yaml_path = tiny_sal_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="PhonemeSaL_Executor", MODEL_CLASS="PhonemeSaL",
        MODEL_MOD_CONFIG_CLASS="CustomizedSaL_config",
        num_decoder_layers=2, n_head=4, max_a_length=24,
        max_eval_length=12, DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    ocr_df, obj_df = ex.serve_frames
    ex_eval = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ex_eval.state = ex_eval.state.replace(params=ex.state.params)
    ex_eval._place_state()
    qa = pd.read_csv(paths["val"])
    want = ex_eval.infer(ex_eval.val_data, 4, 12)
    with ContinuousEngine(ex, ocr_df, obj_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=12) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=600) for f in futs]
    assert got == want


def test_speculative_slots_identical_and_counted(latr):
    """spec_k > 1: every slot verifies a K-token prompt-lookup window per
    device step. The exactness invariant (decode/speculative.py) means the
    answers — AND confidence scores — must equal the plain engine's / the
    executor's; stats expose the measured accept rate."""
    import math

    ex, ocr_df, config, qa = latr
    want, want_scores = ex.infer(ex.val_data, 4, 10, return_scores=True)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10, confidence=True,
                          spec_k=3) as eng:
        assert eng.spec_k == 3
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
        # again with slots warm (refill path + slid prev/cur state)
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got2 = [f.result(timeout=300) for f in futs]
    assert [g["answer"] for g in got] == want
    assert got2 == got
    for g, s in zip(got, want_scores):
        assert abs(g["confidence"] - math.exp(s)) < 1e-3
    s = eng.stats()
    assert s["spec_k"] == 3
    assert s["spec_tokens_per_step"] is not None
    assert s["spec_tokens_per_step"] >= 0.1  # tokens actually flowed


def test_speculative_refused_for_custom_vocab(tmp_path):
    """The custom-decoder families draft from a mismatched vocabulary —
    spec_k must be refused loudly (engine still serves, plain steps)."""
    paths = make_latr_fixture(tmp_path)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
        EXECUTOR="CustomizedLaTr_Executor", MODEL_CLASS="CustomizedLaTr",
        MODEL_MOD_CONFIG_CLASS="CustomizedLaTr_config",
        DecodeTokenizer="ByteTokenizer", num_decoder_layers=2, n_head=4,
        NUM_FREEZE_EPOCH=0, max_a_length=16, max_eval_length=10,
        DTYPE="float32",
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"])
    want = ex.infer(ex.val_data, 4, 10)
    with ContinuousEngine(ex, ocr_df, num_slots=3, prefill_chunk=2,
                          horizon=4, max_answer_length=10,
                          spec_k=4) as eng:
        assert eng.spec_k == 0  # refused: vocabulary mismatch
        futs = [eng.submit(r.image_id, r.question) for r in qa.itertuples()]
        got = [f.result(timeout=300) for f in futs]
    assert got == want


def test_backpressure_counts_drained_waiting_list(latr):
    """max_queue bounds queued + drained-but-unslotted requests TOGETHER.

    The worker drains the bounded Queue into the _waiting list between
    dispatches, so Queue.maxsize alone exerts no backpressure — measured
    round 5 at 2x overload with max_queue=64: zero rejections and p50
    14.8 s (an unbounded backlog). submit must reject once
    qsize + len(_waiting) reaches the bound, whichever side the backlog
    sits on."""
    ex, ocr_df, _, qa = latr
    rows = list(qa.itertuples())

    class _DrainOnly(ContinuousEngine):
        # worker that drains the queue into _waiting but never slots —
        # the exact state the production worker is in between dispatches
        def _run(self):
            while self._drain_queue(block=True):
                time.sleep(0.001)
            exc = RuntimeError("drain-only worker stopped")
            for r in self._waiting:
                r.future.set_exception(exc)

    bound = 5
    with _DrainOnly(ex, ocr_df, num_slots=2, prefill_chunk=2, horizon=4,
                    max_answer_length=10, warmup=False,
                    max_queue=bound) as eng:
        futs = [eng.submit(rows[i % len(rows)].image_id, f"q{i}")
                for i in range(bound)]
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(eng._waiting) < bound:
            time.sleep(0.01)
        assert len(eng._waiting) == bound and eng._queue.qsize() == 0
        with pytest.raises(RuntimeError, match="queue full"):
            eng.submit(rows[0].image_id, "one too many")
    # stop() resolves the never-slotted futures loudly rather than hanging
    for f in futs:
        with pytest.raises(RuntimeError, match="drain-only"):
            f.result(timeout=10)


def test_missing_step_k_fails_fast(latr):
    """A model without a per-row-position step is rejected with a clear
    error (serve.py surfaces it; the gathered-batch engine still serves)."""
    _, ocr_df, _, _ = latr

    class _NoStepK:
        pass

    class _FakeEx:
        model = _NoStepK()

    with pytest.raises(ValueError, match="decode_step_k"):
        ContinuousEngine(_FakeEx(), ocr_df, num_slots=2, warmup=False)


def test_hot_reload_swaps_real_weights_continuous(tmp_path):
    """ContinuousEngine.reload: serve checkpoint A, overwrite with different
    weights, reload — answers equal direct infer under B, the engine never
    stopped, and requests submitted WHILE the restore runs still resolve
    (the drain barrier pauses admission, not the queue)."""
    import jax

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1, max_eval_length=10,
                               DTYPE="float32")
    config = get_config(yaml_path)
    tr = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tr._save_checkpoint("best")
    tr.ckpt.wait()

    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ev._load_trained_checkpoint("best")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    qa = pd.read_csv(paths["val"]).head(4)
    with ContinuousEngine(ev, ocr_df, num_slots=4, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        before = [eng.answer(r.image_id, r.question, timeout=120)
                  for r in qa.itertuples()]
        rng = np.random.RandomState(99)
        new_params = jax.tree.map(
            lambda x: (rng.standard_normal(x.shape) * 0.02).astype(np.float32)
            if hasattr(x, "shape") and x.dtype == np.float32 else x,
            jax.tree.map(np.asarray, tr.state.params),
        )
        tr.state = tr.state.replace(params=new_params)
        tr._save_checkpoint("best")
        tr.ckpt.wait()
        # submit in-flight work, then reload from another thread while the
        # worker is (potentially) still decoding it
        rows = list(qa.itertuples())
        inflight = [eng.submit(r.image_id, r.question) for r in rows]
        eng.reload("best")
        for f in inflight:  # resolved, each under exactly ONE weight tree
            assert isinstance(f.result(timeout=120), str)
        after = [eng.answer(r.image_id, r.question, timeout=120)
                 for r in qa.itertuples()]
        want = ev.infer(ev.val_data, 4, 10)[: len(qa)]
    assert after == want
    assert eng.stats()["reloads"] == 1
    assert before  # served under A without interruption


def test_confidence_and_cache_continuous(latr):
    """confidence=True resolves {"answer", "confidence"} dicts whose scores
    equal executor-level return_scores (exp of mean emitted-token log-prob);
    cache_size memoizes repeats and reload-clearing is covered by the
    reload test."""
    import math

    ex, ocr_df, config, qa = latr
    want_ans, want_scores = ex.infer(ex.val_data, 4, 10, return_scores=True)
    rows = list(qa.head(4).itertuples())
    with ContinuousEngine(ex, ocr_df, num_slots=4, prefill_chunk=2,
                          horizon=4, max_answer_length=10,
                          confidence=True, cache_size=8) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows]
        got = [f.result(timeout=120) for f in futs]
        again = eng.answer(rows[0].image_id, rows[0].question, timeout=120)
    assert [g["answer"] for g in got] == want_ans[: len(rows)]
    for g, s in zip(got, want_scores):
        assert 0.0 < g["confidence"] <= 1.0
        assert abs(g["confidence"] - math.exp(s)) < 1e-3
    assert again == got[0]
    assert eng.stats()["cache_hits"] == 1


def test_concurrent_stress_with_reload(tmp_path):
    """Thread-safety hammer: concurrent submitters with mixed deadlines
    while a reload lands mid-stream. Every request resolves exactly one way
    (answer / expired / rejected), and the engine worker survives."""
    import threading

    paths = make_latr_fixture(tmp_path)
    save = str(tmp_path / "ck")
    yaml_path = tiny_latr_yaml(paths, save, NUM_EPOCHS=1, max_eval_length=10,
                               DTYPE="float32")
    config = get_config(yaml_path)
    tr = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    tr._save_checkpoint("best")
    tr.ckpt.wait()
    ev = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ev._load_trained_checkpoint("best")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)
    ids = sorted(set(ocr_df["image_id"]))

    outcomes = {"ok": 0, "expired": 0, "rejected": 0}
    lock = threading.Lock()
    with ContinuousEngine(ev, ocr_df, num_slots=4, prefill_chunk=2,
                          horizon=4, max_answer_length=10,
                          max_queue=64) as eng:
        def client(seed):
            import random
            rng = random.Random(seed)
            for i in range(30):
                # a few unrealistically tight deadlines exercise shedding
                dl = 0.001 if rng.random() < 0.1 else 30.0
                try:
                    fut = eng.submit(ids[i % len(ids)],
                                     f"s{seed} q{i}", deadline_s=dl)
                except RuntimeError:
                    with lock:
                        outcomes["rejected"] += 1
                    continue
                try:
                    assert isinstance(fut.result(timeout=120), str)
                    with lock:
                        outcomes["ok"] += 1
                except TimeoutError:
                    with lock:
                        outcomes["expired"] += 1

        threads = [threading.Thread(target=client, args=(s,)) for s in range(3)]
        for t in threads:
            t.start()
        eng.reload("best")  # lands while clients are mid-stream
        for t in threads:
            t.join()
        stats = eng.stats()
    assert sum(outcomes.values()) == 90, outcomes
    assert outcomes["ok"] >= 70  # tight-deadline shed is ~10%
    assert stats["served"] == outcomes["ok"]
    assert stats["expired"] == outcomes["expired"]
    assert stats["reloads"] == 1


def test_continuous_over_device_mesh_matches_single(latr, tmp_path):
    """The continuous engine rides the executor's mesh unchanged: a DP x TP
    (4 x 2) engine's slot-based decode answers identically to the
    single-device engine (f32). The risky paths are the chunk scatter into
    arbitrary slot ids across the data axis and the per-row-position cache
    update under a sharded model axis."""
    ex1, ocr_df, config, qa = latr
    from .fixtures import tiny_latr_yaml as _yaml

    paths = {k: getattr(config, p) for k, p in
             [("ocr", "ocr_path"), ("img", "base_img_path"),
              ("train", "qa_train_path"), ("val", "qa_val_path"),
              ("predict", "qa_predict_path")]}
    paths["root"] = str(tmp_path)
    yaml_path = _yaml(paths, str(tmp_path / "ck"), NUM_EPOCHS=1, SAVE=False,
                      max_eval_length=10, DTYPE="float32",
                      MESH={"data": 4, "model": 2})
    mesh_config = get_config(yaml_path)
    ex8 = EXECUTORS.get(mesh_config.EXECUTOR)(mesh_config, mode="eval")
    ex8.state = ex8.state.replace(params=ex1.state.params)
    ex8._place_state()
    rows = list(qa.itertuples())
    with ContinuousEngine(ex8, ocr_df, num_slots=4, prefill_chunk=2,
                          horizon=4, max_answer_length=10) as eng:
        futs = [eng.submit(r.image_id, r.question) for r in rows]
        got = [f.result(timeout=240) for f in futs]
    assert got == ex1.infer(ex1.val_data, 4, 10)[: len(rows)]
