"""Probe (VERDICT r4 item 6): batch-greedy vs slot-refill pool decode for
OFFLINE eval at a realistic answer-length mix.

Batch greedy (`decode/greedy.py`) runs each batch's while_loop until every
row finishes: the batch pays max-over-batch steps. The pool decode
(`decode/pool.py`, ``EVAL_CONTINUOUS: true``) refills finished slots from a
device-resident pool, so total steps track MEAN length instead. At the
bench's random-init uniform lengths this shows ~nothing — this probe forces
a REALISTIC length mix (the reference configs' 3-20 token answer range,
`/root/reference/config/latr.yaml: max_eval_length`) by construction:
per-row target lengths are smuggled into the step functions, which suppress
EOS before the target and force it at the target. Both variants decode the
same rows to the same lengths; only scheduling differs.

Timing excludes the encoder prefill (identical work in both variants) and
follows bench.py's conventions: device-resident inputs, whole variant inside
ONE jitted call, host-materialized outputs, median of repeated runs.

Run on the TPU: python scripts/probe_eval_slots.py [--rows 128] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VOCAB = 36096
L_OCR, L_Q, IMG = 100, 30, 224
MAXL = 20


def make_rows(n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": rng.randn(n, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (n, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, VOCAB, (n, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((n, L_Q), np.int32),
        "ocr_attention_mask": np.ones((n, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, VOCAB, (n, L_OCR)).astype(np.int32),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()
    N, B = args.rows, args.batch
    assert N % B == 0
    n_batches = N // B

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")

    from phoneme_vqa_tpu.config import Config
    from phoneme_vqa_tpu.decode.greedy import greedy_decode
    from phoneme_vqa_tpu.decode.pool import pool_greedy_decode
    from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config

    dims = {}
    if os.environ.get("PROBE_TINY") == "1":  # CPU smoke of the harness
        jax.config.update("jax_platforms", "cpu")  # sitecustomize forces TPU
        dims = dict(
            d_model=32, d_kv=8, num_heads=4, d_ff=64, num_encoder_layers=2,
            num_t5_decoder_layers=2, vit_hidden_size=32, vit_num_layers=2,
            vit_num_heads=4, vit_mlp_dim=64,
        )
    cfg = LaTr_config().build(Config({"t5_vocab_size": VOCAB,
                                      "DTYPE": "bfloat16", **dims}))
    model = LaTr(cfg)
    t5c = cfg.t5
    bos, eos, pad = (t5c.decoder_start_token_id, t5c.eos_token_id,
                     t5c.pad_token_id)

    rows = make_rows(N)
    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        {k: v[:1] for k, v in rows.items()},
        np.zeros((1, 2), np.int32), np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)
    params = jax.device_put(jax.tree.map(
        lambda l: jnp.asarray(
            (host_rng.standard_normal(l.shape) * 0.02).astype(np.float32),
            jnp.bfloat16,
        ),
        abstract,
    ))

    encode = jax.jit(lambda v, mb: model.apply(
        v, mb, MAXL, method=type(model).encode_for_generate
    ))
    caches, masks = [], []
    full_bias = None
    t0 = time.perf_counter()
    for i in range(n_batches):
        mb = {k: v[i * B:(i + 1) * B] for k, v in rows.items()}
        cache, full_bias, enc_mask = encode({"params": params}, mb)
        caches.append(cache)
        masks.append(enc_mask)
    pool_cache = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *caches)
    pool_mask = jnp.concatenate(masks, axis=0)
    stacked_cache = jax.tree.map(lambda *xs: jnp.stack(xs), *caches)
    stacked_mask = jnp.stack(masks)
    np.asarray(pool_mask)
    log(f"prefill {N} rows: {time.perf_counter() - t0:.1f}s (excluded from timing)")

    def forced(logits, hit):
        """Suppress EOS except exactly at the per-row target position, where
        it must dominate every other logit."""
        val = jnp.where(hit, 1e9, -1e9).astype(logits.dtype)
        return logits.at[..., eos].set(val)

    # Everything the regimes vary (per-row target lengths) and everything
    # big (params, caches) is an ARGUMENT of the jitted variants: one
    # compile per variant, reused across all three regimes. Closing over
    # them instead would bake them in as constants and recompile 3x.
    @jax.jit
    def batch_variant(params, st_cache, st_mask, tl_b):
        def one(carry, xs):
            cache, enc_mask, tlb = xs

            def step(cur, cache, i):
                logits, cache = model.apply(
                    {"params": params}, cur, cache, i, full_bias,
                    enc_mask, method=type(model).decode_step,
                )
                return forced(logits, (i + 1) == tlb), cache

            out = greedy_decode(step, cache, B, MAXL, bos, eos, pad)
            return carry, out

        _, outs = jax.lax.scan(one, None, (st_cache, st_mask, tl_b))
        return outs.reshape(N, MAXL)

    @jax.jit
    def pool_variant(params, p_cache, pool_mask_tl):
        # the pool step sees only (tokens, cache, pos, enc_mask) — each
        # row's target length rides as an extra trailing enc_mask column
        # so the refill gather carries it with the row
        def step_k(tokens, cache, pos, enc_mask_tl):
            enc_mask, tls = enc_mask_tl[:, :-1], enc_mask_tl[:, -1]
            logits, cache = model.apply(
                {"params": params}, tokens, cache, pos, full_bias,
                enc_mask, method=type(model).decode_step_k,
            )
            return forced(logits, ((pos + 1) == tls)[:, None]), cache

        return pool_greedy_decode(
            step_k, p_cache, pool_mask_tl, B, MAXL, bos, eos, pad
        )

    def run_regime(name, lengths):
        tl = jnp.asarray(lengths, jnp.int32)  # (N,) emitted tokens incl. EOS
        tl_b = jax.device_put(tl.reshape(n_batches, B))
        pool_mask_tl = jax.device_put(
            jnp.concatenate([pool_mask, tl[:, None]], axis=1)
        )
        variants = {
            "batch": lambda: batch_variant(
                params, stacked_cache, stacked_mask, tl_b
            ),
            "pool": lambda: pool_variant(params, pool_cache, pool_mask_tl),
        }
        results = {}
        for label, fn in variants.items():
            t0 = time.perf_counter()
            out = np.asarray(fn())
            compile_s = time.perf_counter() - t0
            # emitted length = the forced EOS position (bos == pad == 0 for
            # T5, so counting non-pad tokens would miscount)
            lens = (out[:, 1:] == eos).argmax(axis=1) + 1
            assert (lens == np.asarray(lengths)).all(), (
                f"{label}: forced lengths not honored"
            )
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(fn())
                times.append(time.perf_counter() - t0)
            ms = float(np.median(times) * 1000)
            results[label] = ms
            log(f"{name}/{label}: {ms:.1f} ms (compile+first {compile_s:.1f}s)")
        results["speedup"] = round(results["batch"] / results["pool"], 3)
        return results

    rng = np.random.RandomState(7)
    regimes = {
        # the reference configs' eval answer range: 3..max_eval_length
        "uniform_3_19": rng.randint(3, MAXL, size=N),
        # short-dominated (VQA answers are mostly 1-3 words)
        "short_heavy": np.clip(rng.geometric(0.35, size=N) + 2, 3, MAXL - 1),
        # control: equal lengths — slot refill can win nothing
        "fixed_19": np.full(N, MAXL - 1),
    }
    out = {
        "bench": "eval_slots_probe",
        "rows": N, "batch": B, "slots": B, "max_length": MAXL,
        "model": "LaTr-base random-init bf16",
        "regimes": {},
    }
    for name, lengths in regimes.items():
        out["regimes"][name] = {
            "mean_len": round(float(np.mean(lengths)), 1),
            **run_regime(name, lengths),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
