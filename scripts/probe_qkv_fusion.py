"""Probe: does fusing the encoder's Q/K/V (and gated-FFN wi_0/wi_1) weight
matmuls into single wider matmuls beat XLA's separate ones?

The T5 encoder sits at ~38 % MFU (docs/DESIGN.md); one hypothesis is that
3×(N,768)@(768,768) projections pay more weight-load / scheduling overhead
than 1×(N,768)@(768,2304). This times matmul-chains shaped exactly like the
encoder's projection workload at LaTr-base (B=32, L=327, d=768, ff=2048),
dispatch-amortized by chaining layers inside one jit.

Run: python scripts/probe_qkv_fusion.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, L, D, FF, LAYERS = 32, 327, 768, 2048, 60
N = B * L


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_ms(fn, *args, reps=15):
    np.asarray(jax.tree.leaves(fn(*args))[0])  # compile + materialize
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


r = np.random.RandomState(0)
x = jax.device_put(jnp.asarray(r.randn(N, D), jnp.bfloat16))
wq, wk, wv = (jax.device_put(jnp.asarray(r.randn(D, D) * 0.02, jnp.bfloat16))
              for _ in range(3))
wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # (D, 3D)
w0, w1 = (jax.device_put(jnp.asarray(r.randn(D, FF) * 0.02, jnp.bfloat16))
          for _ in range(2))
w01 = jnp.concatenate([w0, w1], axis=1)  # (D, 2FF)
wo = jax.device_put(jnp.asarray(r.randn(FF, D) * 0.02, jnp.bfloat16))


@jax.jit
def qkv_separate(x):
    def body(h, _):
        q, k, v = h @ wq, h @ wk, h @ wv
        # non-foldable combine: q*k elementwise blocks the w-sum rewrite
        h = (q * k + v) * 1e-3 + h
        return h, ()
    return jax.lax.scan(body, x, (), length=LAYERS)[0].sum()


@jax.jit
def qkv_fused(x):
    def body(h, _):
        qkv = h @ wqkv
        q, k, v = jnp.split(qkv, 3, axis=1)
        h = (q * k + v) * 1e-3 + h
        return h, ()
    return jax.lax.scan(body, x, (), length=LAYERS)[0].sum()


@jax.jit
def ffn_separate(x):
    def body(h, _):
        g = jax.nn.gelu(h @ w0) * (h @ w1)
        return (g @ wo) * 1e-3 + h, ()
    return jax.lax.scan(body, x, (), length=LAYERS)[0].sum()


@jax.jit
def ffn_fused(x):
    def body(h, _):
        gh = h @ w01
        g = jax.nn.gelu(gh[:, :FF]) * gh[:, FF:]
        return (g @ wo) * 1e-3 + h, ()
    return jax.lax.scan(body, x, (), length=LAYERS)[0].sum()


@jax.jit
def null(x):
    return x.sum()


if __name__ == "__main__":
    base = median_ms(null, x)
    log(f"null dispatch: {base:.2f} ms")
    for name, fn, flops in (
        ("qkv separate", qkv_separate, LAYERS * 3 * 2 * N * D * D),
        ("qkv fused   ", qkv_fused, LAYERS * 3 * 2 * N * D * D),
        ("ffn separate", ffn_separate, LAYERS * (2 * 2 * N * D * FF + 2 * N * FF * D)),
        ("ffn fused   ", ffn_fused, LAYERS * (2 * 2 * N * D * FF + 2 * N * FF * D)),
    ):
        ms = median_ms(fn, x) - base
        tflops = flops / (ms * 1e-3) / 1e12
        log(f"{name}: {ms:6.2f} ms  {tflops:6.1f} TFLOP/s")
