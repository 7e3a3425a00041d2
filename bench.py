"""Headline benchmark: LaTr-base eval greedy decode throughput.

Metric (BASELINE.json): QA samples/sec/chip for LaTr eval decode at the
reference's shapes (ViT-base 224px -> 197 patches, OCR 100, question 30,
max_eval_length 20, EVAL_BATCH_SIZE 32), vs the PyTorch-CPU reference
implementation (HF ViTModel + T5ForConditionalGeneration.generate with
inputs_embeds fusion, per `/root/reference/core/model/LaTr.py:85-110`),
both at random-init base scale.

Prints ONE JSON line on stdout; details go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# Watchdog: when the TPU tunnel is down, jax.devices() hangs forever and
# so would the driver's round-end bench run. Fail fast and loud instead
# (stderr only — no fake metric line on stdout).
_WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", "3600"))


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"bench.py watchdog: no result after {_WATCHDOG_S:.0f}s — "
        "TPU backend unreachable? (tunnel outage)",
        file=sys.stderr, flush=True,
    )
    os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

try:  # jnp only needed on the TPU path
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
L_OCR = 100
L_Q = 30
MAX_EVAL_LEN = 20
VOCAB = 36096
IMG = 224

CPU_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(b: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": rng.randn(b, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (b, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, VOCAB, (b, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((b, L_Q), np.int32),
        "ocr_attention_mask": np.ones((b, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, VOCAB, (b, L_OCR)).astype(np.int32),
    }


def bench_tpu() -> tuple[float, float, float, float, float, float]:
    import jax

    # persistent compilation cache: the scanned generate takes ~6 min to
    # compile through the remote-compile service on first run
    try:
        cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    from phoneme_vqa_tpu.config import Config
    from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config, make_generate_fn

    cfg = LaTr_config().build(Config({"t5_vocab_size": VOCAB, "DTYPE": "bfloat16"}))
    model = LaTr(cfg)
    batch = make_batch(BATCH)
    log(f"devices: {jax.devices()}")

    # Materialize random bf16 inference weights HOST-SIDE from the abstract
    # param tree (on-device flax init through the tunnel takes ~2 minutes).
    t0 = time.perf_counter()
    abstract = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2), np.int32),
        np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)

    def materialize(leaf):
        arr = (host_rng.standard_normal(leaf.shape) * 0.02).astype(np.float32)
        return jnp.asarray(arr, jnp.bfloat16)

    params = jax.device_put(jax.tree.map(materialize, abstract))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract))
    log(f"host init + H2D: {time.perf_counter() - t0:.1f}s, params {n_params / 1e6:.0f}M")

    # N batches scanned inside ONE compiled call with device-resident inputs:
    # measures device throughput the way a serving loop with async dispatch
    # and an overlapped input pipeline runs. (The tunnel to this chip adds
    # ~28 ms per dispatch and moves H2D data at ~40 MB/s — environmental
    # overheads a real TPU host does not have; they are excluded from the
    # metric and reported separately.) Outputs are host-materialized because
    # the experimental axon backend's block_until_ready does not block.
    generate = make_generate_fn(model, MAX_EVAL_LEN)
    iters = 8

    def timed_runs(one_batch, n_timed=10):
        """Median per-batch wall time: ``iters`` batches scanned inside ONE
        jitted call (amortizes the ~28 ms tunnel dispatch overhead), timed
        ``n_timed`` times -> a true latency distribution, not a best-case."""
        stacked = jax.device_put(
            jax.tree.map(lambda x: np.stack([x] * iters), one_batch)
        )

        @jax.jit
        def run_many(params, stacked):
            def body(_, b):
                return None, generate(params, b)

            _, ids = jax.lax.scan(body, None, stacked)
            return ids

        t0 = time.perf_counter()
        np.asarray(run_many(params, stacked))
        log(f"compile+first run (B={next(iter(one_batch.values())).shape[0]}): "
            f"{time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            np.asarray(run_many(params, stacked))  # host-materialize: axon's
            times.append((time.perf_counter() - t0) / iters)  # BUR doesn't block
        return float(np.median(times) * 1000), float(np.min(times) * 1000)

    p50_batch_ms, best_batch_ms = timed_runs(batch)
    batch1 = {k: v[:1] for k, v in batch.items()}
    p50_b1_ms, _ = timed_runs(batch1)

    throughput = BATCH / (p50_batch_ms / 1000)
    log(
        f"TPU: {throughput:.1f} samples/s (p50 batch={BATCH}: {p50_batch_ms:.1f} ms"
        f", best {best_batch_ms:.1f} ms); p50 per-answer at B=1: {p50_b1_ms:.1f} ms"
    )

    # The VIT_CACHE variant: frozen-ViT encodings precomputed outside the
    # timed loop and fed as the batch input — the eval/serving pipeline once
    # every image is cached (`VIT_CACHE: true`). Reported as extra fields,
    # NOT the headline: the headline times the same per-batch work as the
    # reference (which reruns its frozen ViT every batch).
    enc = jax.jit(
        lambda p, pix: model.apply({"params": p}, pix, method="encode_image")
    )(params, batch["pixel_values"])
    cbatch = {k: v for k, v in batch.items() if k != "pixel_values"}
    cbatch["vit_encodings"] = np.asarray(enc)
    log(f"VIT_CACHE variant: feeding encodings {cbatch['vit_encodings'].shape}")
    p50_cached_ms, _ = timed_runs(cbatch)
    p50_cached_b1_ms, _ = timed_runs({k: v[:1] for k, v in cbatch.items()})
    cached_tput = BATCH / (p50_cached_ms / 1000)
    log(
        f"TPU VIT_CACHE: {cached_tput:.1f} samples/s (p50 {p50_cached_ms:.1f} ms"
        f"); p50 per-answer at B=1: {p50_cached_b1_ms:.1f} ms"
    )
    return (throughput, p50_batch_ms, p50_b1_ms,
            cached_tput, p50_cached_ms, p50_cached_b1_ms)


def bench_cpu_reference() -> float:
    """The PyTorch reference decode path on CPU (cached across rounds —
    the reference doesn't change). Warmed up and timed over >=3 iterations at
    the same batch size as the TPU run (VERDICT r1: the previous number was a
    single un-warmed batch-8 call)."""
    if os.path.isfile(CPU_BASELINE_CACHE):
        cached = json.load(open(CPU_BASELINE_CACHE))
        if cached.get("version") == 2 and cached.get("batch") == BATCH:
            log(f"cpu baseline (cached): {cached['samples_per_sec']:.2f} samples/s")
            return cached["samples_per_sec"]
        log("cpu baseline cache stale (old version or batch mismatch); re-measuring")

    import torch
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration
    from transformers import ViTConfig as HFViTConfig, ViTModel

    torch.manual_seed(0)
    t5 = T5ForConditionalGeneration(
        HFT5Config(
            vocab_size=VOCAB, d_model=768, d_kv=64, num_heads=12, d_ff=3072,
            num_layers=12, num_decoder_layers=12, feed_forward_proj="gated-gelu",
            decoder_start_token_id=0,
        )
    ).eval()
    vit = ViTModel(HFViTConfig(), add_pooling_layer=False).eval()
    proj = torch.nn.Linear(768, 768)
    spatial = torch.nn.ModuleList(
        [torch.nn.Embedding(1024, 768) for _ in range(6)]
    )

    b = BATCH  # same batch size as the TPU measurement
    batch = make_batch(b, seed=1)
    pix = torch.tensor(batch["pixel_values"])
    coords = torch.tensor(batch["coordinates"], dtype=torch.long)
    q_ids = torch.tensor(batch["input_ids"], dtype=torch.long)
    ocr_ids = torch.tensor(batch["tokenized_ocr"], dtype=torch.long)
    q_mask = torch.tensor(batch["src_attention_mask"], dtype=torch.long)
    ocr_mask = torch.tensor(batch["ocr_attention_mask"], dtype=torch.long)

    def one_pass():
        img = proj(vit(pix).last_hidden_state)
        layout = t5.shared(ocr_ids) + sum(
            emb(coords[:, :, i]) for i, emb in enumerate(spatial)
        )
        lang = t5.shared(q_ids)
        fused = torch.cat([img, layout, lang], dim=1)
        mask = torch.cat(
            [torch.ones(img.shape[:2], dtype=torch.long), ocr_mask, q_mask], dim=1
        )
        t5.generate(
            inputs_embeds=fused, attention_mask=mask, max_length=MAX_EVAL_LEN
        )

    with torch.no_grad():
        one_pass()  # warmup (allocator, thread pools, autograd-free tracing)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            one_pass()
            times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    samples_per_sec = b / dt
    log(f"cpu reference (warmed, median of 3): {samples_per_sec:.2f} samples/s "
        f"({dt:.1f}s / {b})")
    json.dump(
        {"samples_per_sec": samples_per_sec, "version": 2, "batch": b,
         "timed_iters": 3, "warmup": 1},
        open(CPU_BASELINE_CACHE, "w"),
    )
    return samples_per_sec


def main():
    (throughput, p50_batch_ms, p50_b1_ms,
     cached_tput, p50_cached_ms, p50_cached_b1_ms) = bench_tpu()
    try:
        baseline = bench_cpu_reference()
        vs = throughput / baseline
    except Exception as e:  # torch/HF hiccup must not kill the bench line
        log(f"cpu baseline failed: {e}")
        vs = -1.0
    print(
        json.dumps(
            {
                "metric": "latr_eval_decode_samples_per_sec_per_chip",
                "value": round(throughput, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs, 2),
                "p50_batch_ms": round(p50_batch_ms, 2),
                "p50_b1_ms": round(p50_b1_ms, 2),
                "vit_cache_samples_per_sec": round(cached_tput, 2),
                "vit_cache_p50_batch_ms": round(p50_cached_ms, 2),
                "vit_cache_p50_b1_ms": round(p50_cached_b1_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
