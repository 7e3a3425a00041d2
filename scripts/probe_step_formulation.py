"""Decode-step formulation probe: analytic fold-in `step` vs `step_k(K=1)`.

The speculative bench's overhead bound (nocopy) matched or beat plain
greedy at every K — suggesting the K-window step's joint-concat softmax
(one (B,H,K,T) einsum + (B,H,K,K) block, concat, softmax, two AV einsums)
is cheaper per trip than the 1-token step's analytic fold-in (select at
``pos == index``, probs masking dance), independent of any acceptance.
This probe pins it: a fixed `lax.fori_loop` of N decode trips (no early
exit, no draft logic, same trajectory both arms — feeding the argmax back)
at LaTr base scale, timed on the chip.

If step_k(K=1) wins, the plain greedy/beam loops should adopt the joint
formulation. Run: ``python scripts/probe_step_formulation.py``.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phoneme_vqa_tpu.config import Config  # noqa: E402
from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config  # noqa: E402

VOCAB = 36096
L_OCR, L_Q, IMG = 100, 30, 224
MAX_LEN = 20
TRIPS = MAX_LEN - 1
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    batch = {
        "pixel_values": rng.randn(batch_size, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (batch_size, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, VOCAB, (batch_size, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((batch_size, L_Q), np.int32),
        "ocr_attention_mask": np.ones((batch_size, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, VOCAB, (batch_size, L_OCR)).astype(np.int32),
    }
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

    def decode_with(step_kind):
        def generate(params, batch):
            cache, full_bias, enc_mask = model.apply(
                {"params": params}, batch, MAX_LEN,
                method=type(model).encode_for_generate,
            )
            b = enc_mask.shape[0]

            def body(i, state):
                toks, cache = state
                if step_kind == "fold_in":
                    logits, cache = model.apply(
                        {"params": params}, toks, cache, i, full_bias,
                        enc_mask, method=type(model).decode_step,
                    )
                else:
                    logits_k, cache = model.apply(
                        {"params": params}, toks[:, None], cache,
                        jnp.full((b,), i, jnp.int32), full_bias, enc_mask,
                        method=type(model).decode_step_k,
                    )
                    logits = logits_k[:, 0]
                return jnp.argmax(logits, -1).astype(jnp.int32), cache

            toks = jnp.zeros((b,), jnp.int32)
            toks, _ = jax.lax.fori_loop(0, TRIPS, body, (toks, cache))
            return toks

        @jax.jit
        def run_many(params, stacked):
            def sbody(_, bch):
                return None, generate(params, bch)

            return jax.lax.scan(sbody, None, stacked)[1]

        return run_many

    stacked = jax.device_put(
        jax.tree.map(lambda x: np.stack([x] * ITERS), batch)
    )
    results = {}
    for kind in ("fold_in", "joint_k1"):
        fn = decode_with(kind)
        t0 = time.perf_counter()
        np.asarray(fn(params, stacked))
        log(f"{kind}: compile+first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(params, stacked))
            times.append((time.perf_counter() - t0) / ITERS)
        ms = float(np.median(times) * 1000)
        log(f"{kind}: p50 {ms:.2f} ms for {TRIPS} fixed trips (B={batch_size})")
        results[kind] = round(ms, 2)
    import json

    print(json.dumps({"batch": batch_size, "trips": TRIPS, **results}))


if __name__ == "__main__":
    main()
