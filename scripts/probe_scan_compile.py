"""SCAN_LAYERS probe: compile-time and runtime, unrolled vs scanned stacks.

VERDICT r2 weak #6: cold compile of the B=32 eval decode program costs ~1.5
minutes and was only amortized (persistent cache), never attacked.
``SCAN_LAYERS: true`` compiles each transformer stack as ONE `lax.scan` body
instead of unrolling 12 blocks — this probe measures, at LaTr base scale on
the real chip:

  * trace+lower and XLA-compile wall time of the jitted whole-sequence
    greedy program (B=32 and B=1) and of the adam train step
  * steady-state p50 runtime of both, to price the scan overhead

Run: ``python scripts/probe_scan_compile.py`` (TPU; no persistent cache is
configured, so every compile below is cold).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from phoneme_vqa_tpu.config import Config  # noqa: E402
from phoneme_vqa_tpu.models.latr import LaTr, LaTr_config, make_generate_fn  # noqa: E402

BATCH = 32
VOCAB = 36096
L_OCR, L_Q, L_A, IMG = 100, 30, 20, 224
MAX_EVAL_LEN = 20
ITERS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(b, rng):
    return {
        "pixel_values": rng.randn(b, 3, IMG, IMG).astype(np.float32),
        "coordinates": rng.randint(0, 1000, (b, L_OCR, 6)).astype(np.int32),
        "input_ids": rng.randint(3, VOCAB, (b, L_Q)).astype(np.int32),
        "src_attention_mask": np.ones((b, L_Q), np.int32),
        "ocr_attention_mask": np.ones((b, L_OCR), np.int32),
        "tokenized_ocr": rng.randint(3, VOCAB, (b, L_OCR)).astype(np.int32),
    }


def host_params(model, batch):
    abstract = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2), np.int32),
        np.ones((1, 2), np.int32),
    )["params"]
    host_rng = np.random.RandomState(0)

    def materialize(leaf):
        return jnp.asarray(
            (host_rng.standard_normal(leaf.shape) * 0.02).astype(np.float32),
            jnp.bfloat16,
        )

    return jax.device_put(jax.tree.map(materialize, abstract))


def time_compile(jitted, *args):
    """(trace+lower seconds, xla-compile seconds, compiled executable)."""
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    return t_lower, t_compile, compiled


def steady_ms(compiled, *args, n=6):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, compiled(*args))  # host-materialize: axon
        times.append(time.perf_counter() - t0)  # block_until_ready is a no-op
    return float(np.median(times) * 1000)


def probe(scan: bool, skip_eval: bool = False, remats=(False,)):
    tag = "scanned " if scan else "unrolled"
    cfg = LaTr_config().build(
        Config(
            {"t5_vocab_size": VOCAB, "DTYPE": "bfloat16", "SCAN_LAYERS": scan}
        )
    )
    model = LaTr(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(BATCH, rng)
    params = host_params(model, batch)
    generate = make_generate_fn(model, MAX_EVAL_LEN)

    out = {"scan": scan}

    if not skip_eval:
        # -- eval decode program, batches scanned inside one jit (bench.py) --
        stacked = jax.device_put(
            jax.tree.map(lambda x: np.stack([x] * ITERS), batch)
        )

        @jax.jit
        def run_many(params, stacked):
            def body(_, b):
                return None, generate(params, b)

            return jax.lax.scan(body, None, stacked)[1]

        t_lower, t_compile, compiled = time_compile(run_many, params, stacked)
        ms = steady_ms(compiled, params, stacked) / ITERS
        log(f"{tag} eval B={BATCH}: lower {t_lower:.1f}s compile "
            f"{t_compile:.1f}s p50 {ms:.1f} ms/batch")
        out["eval_lower_s"], out["eval_compile_s"], out["eval_ms"] = (
            round(t_lower, 1), round(t_compile, 1), round(ms, 1),
        )

        # -- B=1 latency path (the serving cold-start program) --
        b1 = {k: v[:1] for k, v in batch.items()}
        jitted_b1 = jax.jit(generate)
        t_lower, t_compile, compiled = time_compile(jitted_b1, params, b1)
        ms = steady_ms(compiled, params, b1)
        log(f"{tag} eval B=1:  lower {t_lower:.1f}s compile {t_compile:.1f}s "
            f"p50 {ms:.1f} ms")
        out["b1_lower_s"], out["b1_compile_s"], out["b1_ms"] = (
            round(t_lower, 1), round(t_compile, 1), round(ms, 1),
        )

    # -- adam train step (teacher-forced CE, frozen ViT as the reference) --
    labels = rng.randint(3, VOCAB, (BATCH, L_A)).astype(np.int32)
    lmask = np.ones((BATCH, L_A), np.int32)
    for remat in remats:
        rtag = "+remat" if remat else "      "
        rcfg = LaTr_config().build(
            Config({"t5_vocab_size": VOCAB, "DTYPE": "bfloat16",
                    "SCAN_LAYERS": scan, "REMAT": remat})
        )
        rmodel = LaTr(rcfg)
        tx = optax.adam(5e-5)
        f32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)
        opt_state = jax.jit(tx.init)(f32)

        def loss_fn(p, batch, labels, lmask):
            logits = rmodel.apply(
                {"params": p}, batch, labels, lmask, False,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            lb = jnp.asarray(labels)
            ll = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(ll, lb[..., None], -1)[..., 0]
            return jnp.sum(nll * lmask) / jnp.sum(lmask)

        @jax.jit
        def train_step(p, opt_state, batch, labels, lmask):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch, labels, lmask)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        dbatch = jax.device_put(batch)
        key = "train_remat" if remat else "train"
        try:
            t_lower, t_compile, compiled = time_compile(
                train_step, f32, opt_state, dbatch, labels, lmask
            )
        except Exception as e:  # XLA OOM surfaces as JaxRuntimeError
            msg = "OOM" if "memory" in str(e).lower() else repr(e)[:80]
            log(f"{tag} train{rtag} B={BATCH}: compile failed: {msg}")
            out[key] = msg
            continue
        times = []
        state = (f32, opt_state)
        for _ in range(4):
            t0 = time.perf_counter()
            p_new, o_new, loss = compiled(
                state[0], state[1], dbatch, labels, lmask
            )
            np.asarray(loss)
            state = (p_new, o_new)
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times) * 1000)
        log(f"{tag} train{rtag} B={BATCH}: lower {t_lower:.1f}s compile "
            f"{t_compile:.1f}s p50 {ms:.1f} ms/step")
        out[f"{key}_lower_s"] = round(t_lower, 1)
        out[f"{key}_compile_s"] = round(t_compile, 1)
        out[f"{key}_ms"] = round(ms, 1)
    return out


def main():
    import json

    log(f"devices: {jax.devices()}")
    skip_eval = "--train-only" in sys.argv
    remats = (False,)
    if "--remat" in sys.argv:
        remats = (False, True)
    elif "--remat-only" in sys.argv:
        remats = (True,)
    rows = [
        probe(scan, skip_eval=skip_eval, remats=remats)
        for scan in (False, True)
    ]
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
