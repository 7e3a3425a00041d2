"""Microbench: SaL-base encoder with the 2D bias — fused pallas kernel vs the
XLA materialized-(B,H,L,L) path, on real TPU. Run manually:

    python scripts/bench_sal_bias.py [--train]

Reports median wall time for an encoder forward (eval path) and a
forward+backward step (train path), dispatch-amortized (scan of ITERS inside
one jit, host-materialized outputs — see CLAUDE.md axon notes).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8
B, H, L_Q, L_OCR, L_OBJ, D_MODEL = 32, 12, 80, 128, 128, 768
L = L_Q + L_OCR + L_OBJ  # 336


def main():
    import jax
    import jax.numpy as jnp

    import phoneme_vqa_tpu.ops.attention as attn
    from phoneme_vqa_tpu.models.sal import SaL, SaLConfig
    from phoneme_vqa_tpu.models.t5 import T5Config

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    train = "--train" in sys.argv
    t5 = T5Config(vocab_size=36096, dtype=jnp.bfloat16)
    cfg = SaLConfig(t5=t5, ocr_hidden=512, obj_hidden=2048, max_ques=L_Q,
                    max_ocr=L_OCR)
    model = SaL(cfg)
    rng = np.random.RandomState(0)
    v = t5.vocab_size
    batch = {
        "input_ids": rng.randint(3, v, (B, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((B, L_Q), np.int32),
        "tokenized_ocr": rng.randint(3, v, (B, L_OCR)).astype(np.int32),
        "ocr_attention_mask": np.ones((B, L_OCR), np.int32),
        "ocr_coordinates": rng.uniform(0, 1, (B, L_OCR, 4)).astype(np.float32),
        "ocr_features": rng.randn(B, L_OCR, 512).astype(np.float32),
        "tokenized_obj": rng.randint(3, v, (B, L_OBJ)).astype(np.int32),
        "obj_attention_mask": np.ones((B, L_OBJ), np.int32),
        "obj_coordinates": rng.uniform(0, 1, (B, L_OBJ, 4)).astype(np.float32),
        "obj_features": rng.randn(B, L_OBJ, 2048).astype(np.float32),
        "label_ids": rng.randint(3, v, (B, 20)).astype(np.int32),
        "label_attention_mask": np.ones((B, 20), np.int32),
    }

    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        {k: v_[:1] for k, v_ in batch.items() if not k.startswith("label")},
        batch["label_ids"][:1], batch["label_attention_mask"][:1],
    )["params"]
    r = np.random.RandomState(0)
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.asarray(r.standard_normal(s.shape) * 0.02, jnp.bfloat16),
        abstract,
    ))
    batch = jax.device_put(batch)

    model_batch = {k: v_ for k, v_ in batch.items() if not k.startswith("label")}

    def _fuse_encode(model_, mb_):
        embeds, mask, bias = model_.fuse(mb_)
        return model_.t5.encode(embeds, mask, position_bias=bias)

    def encoder_fwd(params, mb):
        return model.apply({"params": params}, mb, method=_fuse_encode)

    def loss_fn(params, b):
        logits = model.apply(
            {"params": params},
            {k: v_ for k, v_ in b.items() if not k.startswith("label")},
            b["label_ids"][:, :-1], b["label_attention_mask"][:, :-1],
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    # scan over ITERS stacked batch copies: every iteration consumes distinct
    # runtime values, so XLA cannot hoist the body out of the loop
    if train:
        stacked = jax.device_put(
            jax.tree.map(lambda x: np.stack([np.asarray(x)] * ITERS), batch)
        )

        def body_fn(p, b):
            g = jax.grad(loss_fn)(p, b)
            return jnp.sum(
                jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g)])
            )

        label = "train fwd+bwd"
    else:
        stacked = jax.device_put(
            jax.tree.map(lambda x: np.stack([np.asarray(x)] * ITERS), model_batch)
        )

        def body_fn(p, b):
            return jnp.sum(encoder_fwd(p, b).astype(jnp.float32))

        label = "encoder fwd"

    def make_run():
        @jax.jit
        def run(p, stacked):
            def body(_, b):
                return None, body_fn(p, b)

            _, out = jax.lax.scan(body, None, stacked)
            return out

        return run

    results = {}
    for mode, fused in (("xla_materialized", False), ("fused_kernel", True)):
        attn.enable_sal_fused(fused)
        run = make_run()
        t0 = time.perf_counter()
        np.asarray(run(params, stacked))
        print(f"{mode}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(run(params, stacked))
            times.append((time.perf_counter() - t0) / ITERS)
        results[mode] = float(np.median(times) * 1000)
        print(f"{mode}: {results[mode]:.2f} ms / {label}", file=sys.stderr,
              flush=True)

    speedup = results["xla_materialized"] / results["fused_kernel"]
    print(f"SaL {label} B={B} L={L}: xla {results['xla_materialized']:.2f} ms, "
          f"fused {results['fused_kernel']:.2f} ms, speedup {speedup:.2f}x")


if __name__ == "__main__":
    main()
