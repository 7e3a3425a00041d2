"""Probe: where do the ~46 ms of encoder+cross-KV time go at LaTr-base B=32?

Times each phase of the generate program's prefill separately on the real
chip — ViT forward, fuse (ViT+embeds), fuse+T5 encoder, full prefill — as a
single jitted call each, subtracting the measured null-dispatch overhead
(the tunnel adds a fixed ~30 ms per call; docs/DESIGN.md). Compares each
phase against its bf16 roofline to find what is off speed-of-light.

Run: python scripts/probe_encoder_phases.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from phoneme_vqa_tpu.config import Config
from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, L_OCR, L_Q, IMG, V = 32, 100, 30, 224, 36096
cfg = LaTr_config().build(Config({"t5_vocab_size": V, "DTYPE": "bfloat16"}))
model = LaTr(cfg)
r = np.random.RandomState(0)
batch = {
    "pixel_values": r.randn(B, 3, IMG, IMG).astype(np.float32),
    "coordinates": r.randint(0, 1000, (B, L_OCR, 6)).astype(np.int32),
    "input_ids": r.randint(3, V, (B, L_Q)).astype(np.int32),
    "src_attention_mask": np.ones((B, L_Q), np.int32),
    "ocr_attention_mask": np.ones((B, L_OCR), np.int32),
    "tokenized_ocr": r.randint(3, V, (B, L_OCR)).astype(np.int32),
}

abstract = jax.eval_shape(
    model.init, jax.random.PRNGKey(0),
    {k: v[:1] for k, v in batch.items()},
    np.zeros((1, 4), np.int32), np.ones((1, 4), np.int32),
)["params"]
rr = np.random.RandomState(1)
params = jax.device_put(
    jax.tree.map(
        lambda s: jnp.asarray((rr.standard_normal(s.shape) * 0.02).astype(np.float32)),
        abstract,
    )
)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
batch = jax.device_put(batch)


def median_ms(fn, *args, reps=15):
    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


@jax.jit
def null(x):
    return x + 1


@jax.jit
def vit_phase(params, batch):
    return model.apply(
        {"params": params}, batch["pixel_values"], method=lambda m, p: m.vit(p)
    ).mean()


@jax.jit
def fuse_phase(params, batch):
    embeds, mask = model.apply({"params": params}, batch, method=type(model).fuse)
    return embeds.mean()


@jax.jit
def encode_phase(params, batch):
    def run(m, b):
        embeds, mask = m.fuse(b)
        return m.t5.encode(embeds, mask)

    return model.apply({"params": params}, batch, method=run).mean()


@jax.jit
def full_prefill(params, batch):
    def run(m, b):
        return m.encode_for_generate(b, 20)

    cache, bias, mask = model.apply({"params": params}, batch, method=run)
    return jax.tree.leaves(cache)[0].mean()


overhead = median_ms(null, jnp.zeros(()))
log(f"null dispatch: {overhead:.1f} ms (subtracted below)")

t_vit = median_ms(vit_phase, params, batch) - overhead
t_fuse = median_ms(fuse_phase, params, batch) - overhead
t_enc = median_ms(encode_phase, params, batch) - overhead
t_pre = median_ms(full_prefill, params, batch) - overhead

tf_vit = 2 * 86e6 * 197 * B / 1e12
tf_t5 = 2 * 85e6 * (197 + L_OCR + L_Q) * B / 1e12
peak = 197.0  # v5e bf16 TFLOP/s
log(f"ViT fwd:            {t_vit:7.2f} ms   (~{tf_vit:.2f} TF -> {tf_vit/(t_vit/1e3):5.1f} TF/s, {tf_vit/(t_vit/1e3)/peak*100:4.1f}% MFU)")
log(f"fuse (ViT+embeds):  {t_fuse:7.2f} ms")
log(f"fuse+T5 encoder:    {t_enc:7.2f} ms   (T5 part ~{t_enc-t_fuse:.2f} ms, ~{tf_t5:.2f} TF -> {tf_t5/max(t_enc-t_fuse,1e-9)*1e3:5.1f} TF/s, {tf_t5/max(t_enc-t_fuse,1e-9)*1e3/peak*100:4.1f}% MFU)")
log(f"full prefill:       {t_pre:7.2f} ms   (cross-KV+decoder-bias ~{t_pre-t_enc:.2f} ms)")
