"""Beam-search decode benchmark on TPU (LaTr-base, K=4, reference shapes).

Run manually: `python scripts/bench_beam.py`. Round-2 result on 1x v5e:
~214 ms/batch device (B=32, len 20) after the static-cross-cache +
one-hot-gather rework — 4.9x the round-1 loop. See docs/DESIGN.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from phoneme_vqa_tpu.config import Config
from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config
from phoneme_vqa_tpu.models.generate import make_beam_generate_fn

BATCH, L_OCR, L_Q, MAX_LEN, VOCAB, IMG, K = 32, 100, 30, 20, 36096, 224, 4
cfg = LaTr_config().build(Config({"t5_vocab_size": VOCAB, "DTYPE": "bfloat16"}))
model = LaTr(cfg)
rng = np.random.RandomState(0)
batch = {
    "pixel_values": rng.randn(BATCH,3,IMG,IMG).astype(np.float32),
    "coordinates": rng.randint(0,1000,(BATCH,L_OCR,6)).astype(np.int32),
    "input_ids": rng.randint(3,VOCAB,(BATCH,L_Q)).astype(np.int32),
    "src_attention_mask": np.ones((BATCH,L_Q),np.int32),
    "ocr_attention_mask": np.ones((BATCH,L_OCR),np.int32),
    "tokenized_ocr": rng.randint(3,VOCAB,(BATCH,L_OCR)).astype(np.int32),
}
abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0),
    {k: v[:1] for k, v in batch.items()}, np.zeros((1,2),np.int32), np.ones((1,2),np.int32))["params"]
r = np.random.RandomState(0)
params = jax.device_put(jax.tree.map(lambda s: jnp.asarray(r.standard_normal(s.shape)*0.02, jnp.bfloat16), abstract))
batch = jax.device_put(batch)
gen = jax.jit(make_beam_generate_fn(model, MAX_LEN, num_beams=K))
t0=time.perf_counter(); out = np.asarray(gen(params, batch)); print("compile+first:", time.perf_counter()-t0)
ts=[]
for _ in range(6):
    t0=time.perf_counter(); np.asarray(gen(params, batch)); ts.append(time.perf_counter()-t0)
med = np.median(ts) - 0.033  # subtract measured fixed dispatch+sync
print(f"beam K={K} B={BATCH} len={MAX_LEN}: ~{med*1000:.1f} ms/batch device, {BATCH/med:.1f} samples/s")
