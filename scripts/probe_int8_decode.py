"""Probe: does int8 weight storage speed up the weight-DMA-bound decode loop?

The decode step is bound by per-step weight DMA (docs/DESIGN.md): ~254 MB of
bf16 projection/lm-head weights stream from HBM every step. If the bound is
BANDWIDTH, storing weights int8 (per-output-channel scales, dequantized
inside the program) should approach 2x on the weight-read side. If the bound
is chunk DMA LATENCY, int8 wins little. This probe times a chained
decode-shaped matmul stack both ways on the real chip; the executor knob is
only worth building if this shows a real win.

Run: python scripts/probe_int8_decode.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, D, DFF, V, LAYERS, STEPS = 32, 768, 2048, 36096, 12, 20

r = np.random.RandomState(0)


def mk(shape):
    return jnp.asarray((r.standard_normal(shape) * 0.02).astype(np.float32))


# per-layer qkvo (4 DxD), gated FFN (2 DxDFF + DFFxD); one lm head DxV
w_layer = [
    {
        "qkvo": mk((4, D, D)),
        "wi": mk((2, D, DFF)),
        "wo": mk((DFF, D)),
    }
    for _ in range(LAYERS)
]
lm = mk((D, V))


def quant(w):
    """int8 per-output-channel symmetric quant along the LAST axis."""
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    q = jnp.round(w / scale).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


params_bf16 = jax.tree.map(lambda w: w.astype(jnp.bfloat16), w_layer)
lm_bf16 = lm.astype(jnp.bfloat16)
params_q = jax.tree.map(quant, w_layer)
lm_q = quant(lm)


def body_bf16(x, _):
    for layer in params_bf16:
        for i in range(4):
            x = jnp.tanh(x @ layer["qkvo"][i])
        h0 = x @ layer["wi"][0]
        h1 = x @ layer["wi"][1]
        x = (jax.nn.gelu(h0) * h1) @ layer["wo"]
    logits = x @ lm_bf16
    # feed something tiny back so the loop is sequential
    x = x + logits[:, :1] * 0
    return x, logits.max()


def deq(qs):
    q, s = qs
    return q.astype(jnp.bfloat16) * s


def body_int8(x, _):
    for layer in params_q:
        qkvo = deq(layer["qkvo"])
        for i in range(4):
            x = jnp.tanh(x @ qkvo[i])
        wi = deq(layer["wi"])
        h0 = x @ wi[0]
        h1 = x @ wi[1]
        x = (jax.nn.gelu(h0) * h1) @ deq(layer["wo"])
    logits = x @ deq(lm_q)
    x = x + logits[:, :1] * 0
    return x, logits.max()


@jax.jit
def run_bf16(x):
    return jax.lax.scan(body_bf16, x, None, length=STEPS)[1]


@jax.jit
def run_int8(x):
    return jax.lax.scan(body_int8, x, None, length=STEPS)[1]


x0 = jnp.asarray(r.standard_normal((B, D)).astype(np.float32), jnp.bfloat16)

for name, fn in (("bf16", run_bf16), ("int8-deq", run_int8)):
    np.asarray(fn(x0))  # compile+warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(x0))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times)) / STEPS * 1e3
    log(f"{name}: {t:.3f} ms/step  ({np.min(times)*1e3/STEPS:.3f} best)")
