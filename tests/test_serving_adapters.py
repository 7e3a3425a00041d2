"""Multi-adapter LoRA serving: one base model, several finetunes, per-request
routing (the modern production serving pattern; no reference counterpart).

A request naming an adapter decodes with ``base + scale * A@B`` merged on
the fly; batches group by adapter, a switch is one jitted param-tree
multiply-add, and the base model is never duplicated. Pins: answer parity
with a manually merged model, per-adapter cache keys, switch accounting,
unknown-adapter rejection, and fail-fast on a mismatched adapter tree.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.data.adapters import textlayout_ocr_adapt
from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml
from phoneme_vqa_tpu.serving import ServingEngine
from phoneme_vqa_tpu.train import lora as lora_mod
from phoneme_vqa_tpu.utils.registry import EXECUTORS


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_adapters")
    paths = make_latr_fixture(tmp)
    yaml_path = tiny_latr_yaml(
        paths, str(tmp / "ck"), NUM_EPOCHS=1, SAVE=False, max_eval_length=10
    )
    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="eval")
    ocr_df = textlayout_ocr_adapt(config.ocr_path)

    spec = lora_mod.from_config(
        __import__("phoneme_vqa_tpu.config", fromlist=["Config"]).Config(
            {"LORA_RANK": 2}
        )
    )
    base = ex._ensure_params()  # eval-mode init is deferred

    def make_adapter(seed):
        """Adapter with NON-zero b so the merged model differs from base."""
        tree = lora_mod.init_lora(base, spec, jax.random.PRNGKey(seed))
        return jax.tree.map(
            lambda x: x
            if x.shape[-2] != spec.rank  # keep 'a', randomize zero 'b'
            else jax.random.normal(jax.random.PRNGKey(seed + 100), x.shape) * 0.1,
            tree,
        )

    adapters = {
        "a1": {"lora": make_adapter(1), "scale": spec.scale},
        "a2": {"lora": make_adapter(2), "scale": spec.scale},
    }
    qa = pd.read_csv(paths["val"])
    return ex, ocr_df, config, qa, base, adapters


def _expected(ex, params, batch_size=4, max_len=10):
    saved = ex.state.params
    ex.state = ex.state.replace(params=params)
    ex._bf16_params_cache = None
    try:
        return ex.infer(ex.val_data, batch_size, max_len)
    finally:
        ex.state = ex.state.replace(params=saved)
        ex._bf16_params_cache = None


def test_adapter_routing_matches_manual_merge(setup):
    ex, ocr_df, config, qa, base, adapters = setup
    want = {None: _expected(ex, base)}
    for name, spec in adapters.items():
        merged = lora_mod.merge_lora(base, spec["lora"], spec["scale"])
        want[name] = _expected(ex, merged)
    # adapters actually change the output (nonzero b) — else the test is vacuous
    assert want["a1"] != want[None] or want["a2"] != want[None]

    with ServingEngine(ex, ocr_df, batch_size=4, max_wait_ms=30,
                       max_answer_length=10, adapters=adapters,
                       cache_size=16) as eng:
        futs = []
        for route in (None, "a1", "a2"):  # interleaved within one gather
            futs += [
                (route, i, eng.submit(r.image_id, r.question, adapter=route))
                for i, r in enumerate(qa.itertuples())
            ]
        got = {(route, i): f.result(timeout=300) for route, i, f in futs}
        # per-adapter cache: the same (image, question) under a different
        # route is a miss, same route is a hit
        row = next(qa.itertuples())
        before = eng.stats()["cache_hits"]
        eng.answer(row.image_id, row.question, adapter="a1", timeout=300)
        assert eng.stats()["cache_hits"] == before + 1
        with pytest.raises(KeyError, match="unknown adapter"):
            eng.submit(row.image_id, row.question, adapter="nope")
    for route in (None, "a1", "a2"):
        assert [got[(route, i)] for i in range(len(qa))] == want[route], route
    s = eng.stats()
    assert s["adapter_switches"] >= 2
    assert s["failed"] == 0


def test_reload_vs_adapter_merge_race(setup):
    """reload() on an HTTP/watcher thread must serialize against the worker's
    _activate(): a merge landing between the checkpoint restore and the
    _base_params capture would make OLD-base+adapter the new "base" —
    permanently poisoned weights. The engine's _swap_lock orders them; the
    base capture must be exactly the restored tree (identity check)."""
    import threading
    import time as _time

    ex, ocr_df, config, qa, base, adapters = setup
    new_base = jax.tree.map(lambda x: x + 0.01, base)

    eng = ServingEngine(ex, ocr_df, batch_size=2, warmup=False,
                        adapters=adapters)
    try:
        restored = threading.Event()

        def fake_restore(loadtype):
            # stand-in for _load_trained_checkpoint: install the new tree,
            # then linger — the window where the old code read
            # executor.state.params AFTER a concurrent merge could land
            ex.state = ex.state.replace(params=new_base)
            ex._bf16_params_cache = None
            restored.set()
            _time.sleep(0.3)

        orig = ex._load_trained_checkpoint
        ex._load_trained_checkpoint = fake_restore
        try:
            # simulate the worker switching adapters mid-reload
            racer_done = threading.Event()

            def racer():
                restored.wait(5)
                eng._activate("a1")  # must block until reload's capture
                racer_done.set()

            t = threading.Thread(target=racer)
            t.start()
            eng.reload("best")
            t.join(10)
            assert racer_done.is_set()
        finally:
            ex._load_trained_checkpoint = orig

        # the poison check: base is the restored tree itself, never a merge
        assert eng._base_params is new_base
        # and the racer's merge was computed ON the new base
        assert eng._active_adapter == "a1"
        merged_leaf = jax.tree.leaves(ex.state.params)[0]
        want_leaf = jax.tree.leaves(
            lora_mod.merge_lora(new_base, adapters["a1"]["lora"],
                                adapters["a1"]["scale"])
        )[0]
        np.testing.assert_allclose(
            np.asarray(merged_leaf), np.asarray(want_leaf), rtol=1e-6
        )
    finally:
        eng.stop()
        ex.state = ex.state.replace(params=base)
        ex._bf16_params_cache = None


def test_mismatched_adapter_fails_fast(setup):
    ex, ocr_df, config, qa, base, adapters = setup
    bad = {
        "bad": {
            "lora": {"nonexistent": {"kernel": {
                "a": np.zeros((4, 2), np.float32),
                "b": np.zeros((2, 4), np.float32),
            }}},
            "scale": 1.0,
        }
    }
    with pytest.raises(ValueError, match="does not match the served base"):
        ServingEngine(ex, ocr_df, batch_size=2, warmup=False, adapters=bad)
