"""Probe (VERDICT r3 weak #1): does XLA hoist the f32->bf16 parameter cast
out of the GRAD_ACCUM_STEPS microbatch scan?

The production train step keeps f32 master weights (`models/t5.py`
param_dtype=float32) and the model casts them to bf16 at every use. Under
`_value_and_grad_accum`'s `lax.scan` (base_executor.py) the cast sits inside
the scan body — if XLA does NOT hoist it, every microbatch re-reads the
~1.5 GB f32 tree, ~8x the weight traffic of a hoisted program.

Two measurements on the real LaTr-base step:

* **production** — `BaseExecutor._value_and_grad_accum` exactly as shipped;
* **hoisted shadow** — the f32 tree is cast ONCE before the scan and the
  microbatch grads (bf16 cotangents of the shadow tree) are accumulated in
  f32. Numerically this matches the production program: the backward matmuls
  already run in bf16 either way, and the per-microbatch cotangent is
  f32-accumulated in both formulations — only WHERE the f32<->bf16
  conversions happen moves.

Also dumps an HLO diagnostic: the number of parameter-sized f32->bf16
converts inside the compiled while-loop body (0 = hoisted).

Usage (quiet host, see CLAUDE.md measurement notes):
    python scripts/probe_accum_cast.py [--batch 256] [--accum 8] [--opt adafactor]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--accum", type=int, default=8)
    p.add_argument("--opt", default="adafactor")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--skip-hlo", action="store_true",
                   help="skip the compile-only HLO diagnostic")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from phoneme_vqa_tpu.config import Config
    from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config
    from phoneme_vqa_tpu.train.base_executor import BaseExecutor
    from phoneme_vqa_tpu.train.optim import (
        build_optimizer,
        cross_entropy_loss,
        epoch_decay_schedule,
    )

    B, ACCUM = args.batch, args.accum
    L_OCR, L_Q, L_A, IMG, V = 100, 30, 32, 224, 36096
    cfg = LaTr_config().build(Config({"t5_vocab_size": V, "DTYPE": "bfloat16"}))
    model = LaTr(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": rng.randn(B, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (B, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, V, (B, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((B, L_Q), np.int32),
        "ocr_attention_mask": np.ones((B, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, V, (B, L_OCR)).astype(np.int32),
        "label_ids": rng.randint(3, V, (B, L_A)).astype(np.int32),
        "label_attention_mask": np.ones((B, L_A), np.int32),
    }
    model_keys = [k for k in batch if not k.startswith("label")]

    abstract = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        {k: batch[k][:1] for k in model_keys},
        batch["label_ids"][:1, :-1],
        batch["label_attention_mask"][:1, :-1],
    )["params"]
    r = np.random.RandomState(0)
    params = jax.device_put(
        jax.tree.map(
            lambda s: jnp.asarray(
                (r.standard_normal(s.shape) * 0.02).astype(np.float32)
            ),
            abstract,
        )
    )
    f32_gb = sum(
        x.size * 4 for x in jax.tree.leaves(abstract)
    ) / 1e9
    log(f"param tree: {f32_gb:.2f} GB f32")

    tx = build_optimizer(
        epoch_decay_schedule(5e-5, 1000), betas=(0.9, 0.98), eps=1e-9,
        kind=args.opt,
    )
    opt_state = jax.device_put(tx.init(params))
    batch = jax.device_put(batch)

    def loss_fn(p, b):
        logits = model.apply(
            {"params": p},
            {k: b[k] for k in model_keys},
            b["label_ids"][:, :-1],
            b["label_attention_mask"][:, :-1],
        )
        return cross_entropy_loss(logits, b["label_ids"][:, 1:], 0)

    # --- (a) production: the executor's own accum loop ----------------------
    _stub = object.__new__(BaseExecutor)
    _stub._loss_from_batch = lambda p, b, rng=None: loss_fn(p, b)

    def vag_production(params, batch):
        return _stub._value_and_grad_accum(params, batch, None, ACCUM)

    # --- (b) hoisted shadow: cast once, accumulate f32 -----------------------
    def vag_hoisted(params, batch):
        bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            params,
        )
        micro = jax.tree.map(
            lambda x: x.reshape((ACCUM, x.shape[0] // ACCUM) + x.shape[1:]),
            batch,
        )

        def body(carry, mb):
            g_acc, l_acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(bf16, mb)
            g_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), g_acc, grads
            )
            return (g_acc, l_acc + loss), None

        zeros = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params
        )
        (grads, loss), _ = jax.lax.scan(
            body, (zeros, jnp.float32(0.0)), micro
        )
        inv = 1.0 / ACCUM
        return loss * inv, jax.tree.map(lambda g: g * inv, grads)

    def make_step(vag):
        def one(params, opt_state, batch):
            loss, grads = vag(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return one

    results = {}
    for name, vag in (("production", vag_production), ("hoisted", vag_hoisted)):
        step = make_step(vag)

        @jax.jit
        def run_many(params, opt_state, batch):
            def body(carry, _):
                p, o, _l = carry
                p, o, loss = step(p, o, batch)
                return (p, o, loss), None
            (p, o, loss), _ = jax.lax.scan(
                body, (params, opt_state, jnp.float32(0)), None,
                length=args.iters,
            )
            return loss

        t0 = time.perf_counter()
        loss = float(np.asarray(run_many(params, opt_state, batch)))
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s loss {loss:.4f}")
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(run_many(params, opt_state, batch)))
            times.append(time.perf_counter() - t0)
        step_s = float(np.median(times)) / args.iters
        results[name] = {
            "step_ms": round(step_s * 1e3, 1),
            "samples_per_sec": round(B / step_s, 1),
        }
        log(f"{name}: {results[name]}")

        if not args.skip_hlo:
            try:
                compiled = (
                    jax.jit(step).lower(params, opt_state, batch).compile()
                )
                txt = compiled.as_text()
                # param-sized f32->bf16 converts inside while/scan BODY
                # computations: 0 in-body = the cast is hoisted (each big
                # weight converted once per step, not once per microbatch)
                pat = re.compile(
                    r"bf16\[(?:36096,768|768,2048|2048,768)[^\]]*\]"
                    r"[^=\n]*=[^\n]*convert"
                )
                total = 0
                in_body = 0
                region_is_body = False
                for line in txt.splitlines():
                    stripped = line.strip()
                    if stripped.endswith("{") and "(" in stripped:
                        head = stripped.split("(")[0].lower()
                        region_is_body = "body" in head or "while" in head
                    n = len(pat.findall(line))
                    total += n
                    if region_is_body:
                        in_body += n
                results[name]["hlo_big_converts_total"] = total
                results[name]["hlo_big_converts_in_loop_bodies"] = in_body
                log(f"{name}: {total} big f32->bf16 converts, {in_body} in loop bodies")
            except Exception as e:
                log(f"HLO diagnostic unavailable: {e}")

    prod, hoist = results["production"], results["hoisted"]
    delta = prod["step_ms"] / hoist["step_ms"] - 1.0
    print(json.dumps({
        "probe": "accum_weight_cast",
        "batch": B, "accum": ACCUM, "optimizer": args.opt,
        "production": prod, "hoisted": hoist,
        "hoisted_speedup_pct": round(delta * 100, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
