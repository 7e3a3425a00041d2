"""Probe: cash the fused SaL-bias kernel's HBM claim (VERDICT r2 item 4).

The fused kernel is time-neutral end to end; its justification is the
~350 MB (at B=32) of HBM it frees by never materializing the (B, H, L, L)
bias. This probe finds the MAX SaL eval/serve batch that completes a full
generate (encode + 20-step greedy while_loop) on the chip, fused vs
materialized, by doubling the batch until failure and bisecting once.
If fused sustains a larger batch, the default-ON is justified by a real
capability; if the ceilings match, the kernel should be demoted to opt-in.

All inputs are generated ON DEVICE inside the jitted program (the sandbox
tunnel moves H2D at ~40 MB/s; feature tensors at B=1024 would take minutes
to ship) — OOM behavior is identical either way.

Run: python scripts/probe_sal_batch_ceiling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import phoneme_vqa_tpu.ops.attention as attn
from phoneme_vqa_tpu.models.generate import make_generate_fn
from phoneme_vqa_tpu.models.sal import SaL, SaLConfig
from phoneme_vqa_tpu.models.t5 import T5Config

H, L_Q, L_OCR, L_OBJ = 12, 80, 128, 128
MAX_LEN = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_batch(b: int):
    """Assemble the SaL model batch on device from a PRNG key (no H2D)."""
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    v = 36096

    @jax.jit
    def build():
        return {
            "input_ids": jax.random.randint(ks[0], (b, L_Q), 3, v, jnp.int32),
            "src_attention_mask": jnp.ones((b, L_Q), jnp.int32),
            "tokenized_ocr": jax.random.randint(ks[1], (b, L_OCR), 3, v, jnp.int32),
            "ocr_attention_mask": jnp.ones((b, L_OCR), jnp.int32),
            "ocr_coordinates": jax.random.uniform(ks[2], (b, L_OCR, 4)),
            "ocr_features": jax.random.normal(ks[3], (b, L_OCR, 512)),
            "tokenized_obj": jax.random.randint(ks[4], (b, L_OBJ), 3, v, jnp.int32),
            "obj_attention_mask": jnp.ones((b, L_OBJ), jnp.int32),
            "obj_coordinates": jax.random.uniform(ks[5], (b, L_OBJ, 4)),
            "obj_features": jax.random.normal(ks[6], (b, L_OBJ, 2048)),
        }

    return build()


def try_batch(model, params, b: int, fused: bool) -> bool:
    attn.enable_sal_fused(fused)
    try:
        batch = device_batch(b)
        generate = jax.jit(make_generate_fn(model, MAX_LEN))
        t0 = time.perf_counter()
        ids = np.asarray(generate(params, batch))
        dt = time.perf_counter() - t0
        assert ids.shape[0] == b
        log(f"  B={b:5d} {'fused' if fused else 'xla  '}: OK ({dt:.1f}s)")
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        log(f"  B={b:5d} {'fused' if fused else 'xla  '}: FAIL {type(e).__name__}: {msg}")
        return False
    finally:
        attn.enable_sal_fused(True)


def max_batch(model, params, fused: bool, start: int = 32, cap: int = 4096) -> int:
    b, last_ok = start, 0
    while b <= cap and try_batch(model, params, b, fused):
        last_ok, b = b, b * 2
    if last_ok == 0:
        return 0
    if b > cap:
        return last_ok
    # one bisection step between last_ok and the failing b
    mid = (last_ok + b // 1) // 2
    mid = (mid // 32) * 32
    if mid > last_ok and try_batch(model, params, mid, fused):
        last_ok = mid
    return last_ok


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")
    t5 = T5Config(vocab_size=36096, dtype=jnp.bfloat16)
    cfg = SaLConfig(t5=t5, ocr_hidden=512, obj_hidden=2048, max_ques=L_Q,
                    max_ocr=L_OCR)
    model = SaL(cfg)

    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.tree.map(lambda x: np.asarray(x)[:1], jax.device_get(device_batch(1))),
        np.zeros((1, 2), np.int32), np.ones((1, 2), np.int32),
    )["params"]
    r = np.random.RandomState(0)
    params = jax.device_put(jax.tree.map(
        lambda s: jnp.asarray(r.standard_normal(s.shape) * 0.02, jnp.bfloat16),
        abstract,
    ))

    results = {}
    for fused in (True, False):
        name = "fused" if fused else "materialized"
        log(f"== {name} path")
        results[name] = max_batch(model, params, fused)
        log(f"{name}: max generate batch = {results[name]}")

    print(json.dumps({
        "probe": "sal_generate_max_batch",
        "shapes": f"SaL-base L={L_Q + L_OCR + L_OBJ} bf16 len={MAX_LEN}",
        **results,
        "fused_advantage": results["fused"] - results["materialized"],
    }))


if __name__ == "__main__":
    main()
