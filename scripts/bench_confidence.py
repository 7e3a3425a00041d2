"""Measure the cost of confidence scoring in the compiled decode loop.

docs/SERVING.md claims `with_scores=True` (one log-softmax + gather per
decode step) is noise next to the step's weight-DMA chain. This cashes the
claim: LaTr-base greedy eval decode at B=32 (bench.py's headline shape),
scored vs unscored, same scan-of-batches timing harness. Prints one JSON
line with both p50s and the overhead percentage.

Run on the TPU (no env flips needed); ~2 min warm, longer on a cold
compile cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import BATCH, MAX_EVAL_LEN, VOCAB, make_batch  # noqa: E402
from phoneme_vqa_tpu.config import Config  # noqa: E402
from phoneme_vqa_tpu.models.latr import (  # noqa: E402
    LaTr,
    LaTr_config,
    make_generate_fn,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    cfg = LaTr_config().build(Config({"t5_vocab_size": VOCAB, "DTYPE": "bfloat16"}))
    model = LaTr(cfg)
    batch = make_batch(BATCH)
    log(f"devices: {jax.devices()}")

    abstract = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2), np.int32),
        np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)
    params = jax.device_put(jax.tree.map(
        lambda leaf: jnp.asarray(
            (host_rng.standard_normal(leaf.shape) * 0.02).astype(np.float32),
            jnp.bfloat16,
        ),
        abstract,
    ))

    iters = 8
    stacked = jax.device_put(
        jax.tree.map(lambda x: np.stack([x] * iters), batch)
    )

    def timed(with_scores: bool, n_timed: int = 10) -> float:
        generate = make_generate_fn(
            model, MAX_EVAL_LEN, with_scores=with_scores
        )

        @jax.jit
        def run_many(params, stacked):
            def body(_, b):
                return None, generate(params, b)

            _, out = jax.lax.scan(body, None, stacked)
            return out

        t0 = time.perf_counter()
        jax.tree.map(np.asarray, run_many(params, stacked))
        log(f"scores={with_scores}: compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            jax.tree.map(np.asarray, run_many(params, stacked))
            times.append((time.perf_counter() - t0) / iters)
        return float(np.median(times) * 1000)

    plain_ms = timed(False)
    scored_ms = timed(True)
    overhead_pct = 100.0 * (scored_ms - plain_ms) / plain_ms
    log(
        f"B={BATCH}: plain {plain_ms:.1f} ms/batch, scored {scored_ms:.1f} "
        f"ms/batch ({overhead_pct:+.1f}%)"
    )
    print(json.dumps({
        "metric": "confidence_scoring_overhead",
        "batch": BATCH,
        "plain_p50_ms": round(plain_ms, 2),
        "scored_p50_ms": round(scored_ms, 2),
        "overhead_pct": round(overhead_pct, 2),
    }))


if __name__ == "__main__":
    main()
