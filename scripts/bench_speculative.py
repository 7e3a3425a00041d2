"""SPEC_DECODE benchmark: speculative vs plain greedy decode on the TPU.

Measures the production speculative path end-to-end at LaTr base scale
(`make_speculative_generate_fn`: prompt-lookup drafts over tokenized_ocr ++
question, K-token verification, per-row advance) in the two regimes that
bound real behavior:

* copy  — the answer's tokens appear verbatim in the draft-lookup corpus
  (the scene-text VQA regime the feature targets): the model's own output
  is planted into `spec_source_ids` (self-consistent fixpoint, two planting
  iterations), so the production n-gram lookup drafts correctly and
  acceptance is high END-TO-END through the real loop
* nocopy — the corpus is empty (all-masked): every draft verify-fails and
  the loop degrades to greedy one-token trips (the overhead bound)

Exactness note: on CPU/f32 the speculative ids are asserted token-for-token
equal to plain greedy (tests/test_speculative.py). On TPU bf16 the K-token
verification sums attention in a different order than the 1-token step, so
near-tied random-init logits can flip — the bench therefore reports the
token-agreement fraction vs plain greedy (same caveat class as the fused
SaL kernel's random-init number, docs/DESIGN.md).
Run: ``python scripts/bench_speculative.py [--batch 32]``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phoneme_vqa_tpu.config import Config  # noqa: E402
from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config, make_generate_fn  # noqa: E402
from phoneme_vqa_tpu.models.generate import make_speculative_generate_fn  # noqa: E402

VOCAB = 36096
L_OCR, L_Q, IMG = 100, 30, 224
MAX_EVAL_LEN = 20
ITERS = 8
KS = (2, 4, 8)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(b, rng):
    return {
        "pixel_values": rng.randn(b, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (b, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, VOCAB, (b, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((b, L_Q), np.int32),
        "ocr_attention_mask": np.ones((b, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, VOCAB, (b, L_OCR)).astype(np.int32),
    }


def timed(fn, params, stacked, n=8):
    t0 = time.perf_counter()
    first = jax.tree.map(np.asarray, fn(params, stacked))
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.tree.map(np.asarray, fn(params, stacked))
        times.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(times) * 1000), out


def scan_of_batches(gen):
    @jax.jit
    def run_many(params, stacked):
        def body(_, b):
            return None, gen(params, b)

        return jax.lax.scan(body, None, stacked)[1]

    return run_many


def main():
    batch_size = 32
    if "--batch" in sys.argv:
        batch_size = int(sys.argv[sys.argv.index("--batch") + 1])
    log(f"devices: {jax.devices()} batch={batch_size}")

    cfg = LaTr_config().build(
        Config({"t5_vocab_size": VOCAB, "DTYPE": "bfloat16"})
    )
    model = LaTr(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(batch_size, rng)

    abstract = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2), np.int32),
        np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)
    params = jax.device_put(
        jax.tree.map(
            lambda leaf: jnp.asarray(
                (host_rng.standard_normal(leaf.shape) * 0.02).astype(np.float32),
                jnp.bfloat16,
            ),
            abstract,
        )
    )

    # -- plain greedy baseline (the bench.py path) --
    plain = scan_of_batches(make_generate_fn(model, MAX_EVAL_LEN))
    stacked = jax.device_put(
        jax.tree.map(lambda x: np.stack([x] * ITERS), batch)
    )
    log("plain greedy:")
    base_ms, base_ids = timed(plain, params, stacked)
    log(f"plain greedy p50: {base_ms:.1f} ms/batch")
    ref = np.asarray(base_ids)[0]  # (B, T)

    def agreement(ids):
        got = np.asarray(ids)[0]
        return float((got == ref).mean())

    def with_source(src_ids, src_mask):
        b2 = dict(batch)
        b2["spec_source_ids"] = src_ids
        b2["spec_source_mask"] = src_mask
        return jax.device_put(
            jax.tree.map(lambda x: np.stack([x] * ITERS), b2)
        )

    empty_src = np.zeros((batch_size, L_OCR), np.int32)
    empty_mask = np.zeros((batch_size, L_OCR), np.int32)
    nocopy_stacked = with_source(empty_src, empty_mask)

    def plant(ids):
        """Self-consistent copy corpus: the run's own (B, T) output ids."""
        arr = np.asarray(ids)[0]
        src = np.zeros((batch_size, L_OCR), np.int32)
        src[:, : MAX_EVAL_LEN - 1] = arr[:, 1:]
        return with_source(src, (src != 0).astype(np.int32))

    rows = [{"k": 1, "regime": "plain", "ms": round(base_ms, 1)}]
    for k in KS:
        spec = scan_of_batches(
            make_speculative_generate_fn(model, MAX_EVAL_LEN, k)
        )
        log(f"SPEC_DECODE={k} nocopy (overhead bound):")
        ms_n, ids_n = timed(spec, params, nocopy_stacked)
        # two planting iterations toward the bf16 fixpoint, then measure
        _, ids_p1 = timed(spec, params, plant(ids_n), n=1)
        log(f"SPEC_DECODE={k} copy (planted fixpoint):")
        ms_c, ids_c = timed(spec, params, plant(ids_p1))
        agree_n, agree_c = agreement(ids_n), agreement(ids_c)
        fix_agree = float(
            (np.asarray(ids_c)[0] == np.asarray(ids_p1)[0]).mean()
        )  # fixpoint convergence: the planted corpus vs what was decoded
        log(
            f"K={k}: copy {ms_c:.1f} ms ({base_ms / ms_c:.2f}x, "
            f"agree={agree_c:.3f}, fixpoint={fix_agree:.3f}); "
            f"nocopy {ms_n:.1f} ms "
            f"({base_ms / ms_n:.2f}x, agree={agree_n:.3f})"
        )
        rows.append({
            "k": k,
            "copy_ms": round(ms_c, 1),
            "copy_speedup": round(base_ms / ms_c, 2),
            "copy_token_agreement": round(agree_c, 3),
            "copy_fixpoint_agreement": round(fix_agree, 3),
            "nocopy_ms": round(ms_n, 1),
            "nocopy_speedup": round(base_ms / ms_n, 2),
            "nocopy_token_agreement": round(agree_n, 3),
        })
    print(json.dumps({"batch": batch_size, "rows": rows}))


if __name__ == "__main__":
    main()
