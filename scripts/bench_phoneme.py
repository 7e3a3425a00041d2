"""Flagship-path benchmark: PhonemeLaTr-base triple-stream eval decode on TPU.

Same methodology as bench.py (host-side init, device-resident inputs, N
batches scanned inside ONE jitted call to amortize the tunnel dispatch,
medians over repeated timed runs). Shapes follow the reference's
phonemelatr.yaml: ViT-base 224 px, OCR 100, question 30, EVAL_BATCH_SIZE 32,
max_eval_length 20, 4-layer/12-head triple decoder
(`/root/reference/config/phonemelatr.yaml`).

Run: python scripts/bench_phoneme.py   (BENCH_BATCH to override batch)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
L_OCR, L_Q, IMG, V = 100, 30, 224, 36096
MAX_LEN = 20
ONSET, RHYME, TONE = 32, 256, 8  # representative structured-vocab sizes


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    from phoneme_vqa_tpu.config import Config
    from phoneme_vqa_tpu.models.generate import make_multi_head_generate_fn
    from phoneme_vqa_tpu.models.latr import LaTr_config
    from phoneme_vqa_tpu.models.phoneme import (
        PhonemeLaTr,
        PhonemeLaTrConfig,
        phoneme_decoder_from_yaml,
    )

    cfg_yaml = Config({"t5_vocab_size": V, "DTYPE": "bfloat16",
                       "n_head": 12, "num_decoder_layers": 4})
    base = LaTr_config().build(cfg_yaml)
    pd_cfg = phoneme_decoder_from_yaml(
        cfg_yaml, base.t5, onset_vocab=ONSET, rhyme_vocab=RHYME,
        tone_vocab=TONE, pad_id=0, bos_id=1, eos_id=2,
    )
    cfg = PhonemeLaTrConfig(
        t5=base.t5, vit=base.vit,
        max_2d_position_embeddings=1024, freeze_vit=True,
        phoneme_decoder=pd_cfg,
    )
    model = PhonemeLaTr(cfg)

    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": rng.randn(BATCH, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (BATCH, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, V, (BATCH, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((BATCH, L_Q), np.int32),
        "ocr_attention_mask": np.ones((BATCH, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, V, (BATCH, L_OCR)).astype(np.int32),
    }
    log(f"devices: {jax.devices()}")

    t0 = time.perf_counter()
    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2, 3), np.int32), np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)
    params = jax.device_put(
        jax.tree.map(
            lambda s: jnp.asarray(
                (host_rng.standard_normal(s.shape) * 0.02).astype(np.float32),
                jnp.bfloat16,
            ),
            abstract,
        )
    )
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract))
    log(f"host init + H2D: {time.perf_counter() - t0:.1f}s, params {n_params/1e6:.0f}M")

    generate = make_multi_head_generate_fn(
        model, max_length=MAX_LEN, num_components=3,
        bos_id=pd_cfg.bos_id, eos_id=pd_cfg.eos_id, pad_id=pd_cfg.pad_id,
        stop_component=0,
    )
    iters = 8
    stacked = jax.device_put(jax.tree.map(lambda x: np.stack([x] * iters), batch))

    @jax.jit
    def run_many(params, stacked):
        def body(_, b):
            return None, generate(params, b)

        _, ids = jax.lax.scan(body, None, stacked)
        return ids

    t0 = time.perf_counter()
    out = np.asarray(run_many(params, stacked))
    log(f"compile+first: {time.perf_counter() - t0:.1f}s, out {out.shape}")
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(run_many(params, stacked))
        times.append(time.perf_counter() - t0)
    batch_ms = float(np.median(times)) / iters * 1e3
    sps = BATCH / (batch_ms / 1e3)
    log(f"PhonemeLaTr triple decode: {sps:.1f} samples/s "
        f"(p50 {batch_ms:.1f} ms/batch of {BATCH}, len {MAX_LEN})")
    print(
        '{"metric": "phoneme_latr_eval_decode_samples_per_sec_per_chip", '
        f'"value": {sps:.2f}, "unit": "samples/sec/chip", '
        f'"p50_batch_ms": {batch_ms:.2f}}}'
    )


if __name__ == "__main__":
    main()
