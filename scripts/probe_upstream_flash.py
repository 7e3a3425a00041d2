"""Probe: does the UPSTREAM Pallas flash-attention kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`, tuned by the TPU team)
beat XLA's fused attention at this framework's shapes? (VERDICT r2 item 3 —
round 2 only proved our HAND-ROLLED kernel loses; that left the 38% encoder
MFU ceiling standing on weak evidence.)

Compares, at LaTr/SaL encoder shapes (B=32, H=12, D=64, L=327/336 padded to
384 — the kernel requires seq % 128 == 0) and longer stress lengths:

  xla      — ops/attention.reference_attention (the production default)
  upstream — upstream flash_attention, additive T5/SaL bias via `ab`,
             padding folded into the bias mask

for encoder forward AND train fwd+bwd (the upstream kernel ships its own
custom VJP). Timing: N iterations scanned inside ONE jitted call
(amortizes the ~28 ms axon dispatch overhead), host-materialized scalar
output, median of repeats.

Run: python scripts/probe_upstream_flash.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from phoneme_vqa_tpu.ops.attention import reference_attention


def log(*a):
    print(*a, file=sys.stderr, flush=True)


H, D = 12, 64
ITERS = 20


def pad_len(l):
    return -(-l // 128) * 128


def make_inputs(b, l, seed=0, dtype=jnp.bfloat16):
    """q/k/v at the PADDED length; additive bias (B,H,L,L) f32 carrying the
    T5-style rel bias plus -1e9 on pad keys (how both paths see masking)."""
    lp = pad_len(l)
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(b, H, lp, D), dtype) * 0.1
    k = jnp.asarray(r.randn(b, H, lp, D), dtype) * 0.1
    v = jnp.asarray(r.randn(b, H, lp, D), dtype) * 0.1
    bias = r.randn(1, H, lp, lp).astype(np.float32) * 0.5
    bias[:, :, :, l:] = -1e9  # padded keys masked for every query
    bias = jnp.asarray(np.broadcast_to(bias, (b, H, lp, lp)).copy())
    return q, k, v, bias


def timed_ms(fn, args, reps=10):
    """Median per-iteration ms of `fn(*args)` scanned ITERS times in one jit.
    The carried scalar perturbs q each iteration so the body is NOT
    loop-invariant (XLA would otherwise hoist the whole attention out of the
    scan and time a single call)."""
    q, rest = args[0], args[1:]

    @jax.jit
    def run(q, rest):
        def body(c, _):
            out = fn(q + c.astype(q.dtype), *rest)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    float(run(q, rest))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(q, rest))
        ts.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(ts)) * 1e3


def xla_fwd(q, k, v, bias):
    return reference_attention(q, k, v, bias)


def upstream_fwd(q, k, v, bias):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa.flash_attention(q, k, v, ab=bias, sm_scale=1.0)


def loss_of(fwd):
    def loss(q, k, v, bias):
        return jnp.sum(fwd(q, k, v, bias).astype(jnp.float32) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2))


def fwd_bwd_fn(fwd):
    g = loss_of(fwd)

    def both(q, k, v, bias):
        dq, dk, dv = g(q, k, v, bias)
        return dq + dk + dv

    return both


def main():
    log(f"devices: {jax.devices()}")
    rows = []
    for b, l, label in [
        (32, 327, "LaTr-enc"),
        (32, 336, "SaL-enc"),
        (8, 1024, "stress-1k"),
        (4, 2048, "stress-2k"),
    ]:
        q, k, v, bias = make_inputs(b, l)
        args = (q, k, v, bias)
        t_x = timed_ms(xla_fwd, args)
        try:
            t_u = timed_ms(upstream_fwd, args)
        except Exception as e:
            log(f"{label}: upstream fwd failed: {e}")
            t_u = float("nan")
        t_xb = timed_ms(fwd_bwd_fn(xla_fwd), args)
        try:
            t_ub = timed_ms(fwd_bwd_fn(upstream_fwd), args)
        except Exception as e:
            log(f"{label}: upstream bwd failed: {type(e).__name__} {e}")
            t_ub = float("nan")
        rows.append((label, b, pad_len(l), t_x, t_u, t_xb, t_ub))
        log(
            f"{label:10s} B={b:3d} Lpad={pad_len(l):5d} | fwd xla {t_x:7.3f} ms"
            f"  upstream {t_u:7.3f} ms | fwd+bwd xla {t_xb:7.3f} ms"
            f"  upstream {t_ub:7.3f} ms"
        )

    print("\n| shape | B | Lpad | fwd XLA | fwd upstream | fwd+bwd XLA | fwd+bwd upstream |")
    print("|---|---|---|---|---|---|---|")
    for label, b, lp, t_x, t_u, t_xb, t_ub in rows:
        print(
            f"| {label} | {b} | {lp} | {t_x:.3f} ms | {t_u:.3f} ms "
            f"| {t_xb:.3f} ms | {t_ub:.3f} ms |"
        )


if __name__ == "__main__":
    main()
