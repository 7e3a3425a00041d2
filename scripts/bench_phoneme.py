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

    beam_k = int(os.environ.get("BENCH_PHONEME_BEAM", "0")) or (
        int(sys.argv[sys.argv.index("--beam") + 1]) if "--beam" in sys.argv else 0
    )
    if beam_k:
        # the framework's novel decode: JOINT onset x rhyme x tone beam
        # (semantics from the reference prototype
        # `/root/reference/PhonoLaTr/ModelLaTr.py:260-388`, which never ran)
        from phoneme_vqa_tpu.models.generate import make_multi_head_beam_generate_fn

        generate = make_multi_head_beam_generate_fn(
            model, max_length=MAX_LEN, num_beams=beam_k,
            bos_id=pd_cfg.bos_id, eos_id=pd_cfg.eos_id, pad_id=pd_cfg.pad_id,
            stop_component=0,
        )
        metric = f"phoneme_latr_joint_beam{beam_k}_samples_per_sec_per_chip"
        label = f"PhonemeLaTr joint beam K={beam_k}"
    else:
        generate = make_multi_head_generate_fn(
            model, max_length=MAX_LEN, num_components=3,
            bos_id=pd_cfg.bos_id, eos_id=pd_cfg.eos_id, pad_id=pd_cfg.pad_id,
            stop_component=0,
        )
        metric = "phoneme_latr_eval_decode_samples_per_sec_per_chip"
        label = "PhonemeLaTr triple decode"
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
    log(f"{label}: {sps:.1f} samples/s "
        f"(p50 {batch_ms:.1f} ms/batch of {BATCH}, len {MAX_LEN})")
    print(
        f'{{"metric": "{metric}", '
        f'"value": {sps:.2f}, "unit": "samples/sec/chip", '
        f'"p50_batch_ms": {batch_ms:.2f}}}'
    )




# ---------------------------------------------------------------------------
# PhonemeSaL: the one phoneme family whose REFERENCE decode runs — measured
# against the reference's own torch-CPU path at the same shapes
# (`/root/reference/config/phonemesal.yaml`: q 80 + ocr 128 + obj 128,
# max_eval_length 80, 4-layer/12-head decoder, flat vocab 253).
# ---------------------------------------------------------------------------

L_Q_SAL, L_OCR_SAL, L_OBJ_SAL = 80, 128, 128
SAL_MAX_LEN = 80
FLAT_VOCAB = 253
CPU_BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cpu_phoneme_baseline.json",
)


def sal_batch(b: int, v: int):
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(3, v, (b, L_Q_SAL)).astype(np.int32),
        "src_attention_mask": np.ones((b, L_Q_SAL), np.int32),
        "tokenized_ocr": rng.randint(3, v, (b, L_OCR_SAL)).astype(np.int32),
        "ocr_attention_mask": np.ones((b, L_OCR_SAL), np.int32),
        "ocr_coordinates": rng.uniform(0, 1, (b, L_OCR_SAL, 4)).astype(np.float32),
        "ocr_features": rng.randn(b, L_OCR_SAL, 512).astype(np.float32),
        "tokenized_obj": rng.randint(3, v, (b, L_OBJ_SAL)).astype(np.int32),
        "obj_attention_mask": np.ones((b, L_OBJ_SAL), np.int32),
        "obj_coordinates": rng.uniform(0, 1, (b, L_OBJ_SAL, 4)).astype(np.float32),
        "obj_features": rng.randn(b, L_OBJ_SAL, 2048).astype(np.float32),
    }


def cpu_reference_phoneme_sal(b: int) -> float:
    """Warmed torch-CPU samples/s of the reference PhonemeSaL greedy decode
    (its only runnable phoneme path), cached — the reference doesn't change."""
    import json as _json

    if os.path.isfile(CPU_BASELINE):
        cached = _json.load(open(CPU_BASELINE))
        if cached.get("batch") == b:
            log(f"cpu phoneme baseline (cached): {cached['samples_per_sec']:.3f}/s")
            return cached["samples_per_sec"]

    import functools

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from reference_loader import load_reference_package
    from transformers import T5Config as HFT5Config

    ref_mod = load_reference_package("core.model.PhonemeSaL")
    sal_utils = load_reference_package("core.model.modules.SaL_utils")
    t5_cfg = HFT5Config(
        vocab_size=V, d_model=768, d_kv=64, num_heads=12, d_ff=2048,
        num_layers=12, num_decoder_layers=12, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    t5_cfg.new_token_embedding_size = V
    t5_cfg.ocr_hidden, t5_cfg.obj_hidden = 512, 2048
    t5_cfg.num_decoder_layers, t5_cfg.n_head = 4, 12

    class _EncF:
        @staticmethod
        def from_pretrained(name):
            return sal_utils.T52DEncoderModel(t5_cfg)

    old = (ref_mod.T52DEncoderModel, ref_mod.RelativePositionBias1D,
           ref_mod.SCPRelativePositionBias)
    ref_mod.T52DEncoderModel = _EncF
    ref_mod.RelativePositionBias1D = functools.partial(
        sal_utils.RelativePositionBias1D, device="cpu")
    ref_mod.SCPRelativePositionBias = functools.partial(
        sal_utils.SCPRelativePositionBias, device="cpu")
    try:
        torch.manual_seed(0)
        ref = ref_mod.PhonemeSaL(
            t5_cfg, vocab_size=FLAT_VOCAB, obj_dropout=0.0, ocr_dropout=0.0
        ).eval()
    finally:
        (ref_mod.T52DEncoderModel, ref_mod.RelativePositionBias1D,
         ref_mod.SCPRelativePositionBias) = old

    batch = sal_batch(b, V)
    tt = lambda k, dt: torch.tensor(batch[k]).to(dt)

    def one_run():
        # the reference greedy loop (PhonemeSaL.py:134-192) with the
        # intended bool key-padding mask — its shipped int64 mask is
        # rejected by torch>=2 (README "Reference bugs fixed by design");
        # computation and cost are otherwise identical
        with torch.no_grad():
            obj_emb = ref._calculate_obj_embedding(
                tt("tokenized_obj", torch.long),
                tt("obj_coordinates", torch.float32),
                tt("obj_features", torch.float32))
            ocr_emb = ref._calculate_ocr_embedding(
                tt("tokenized_ocr", torch.long),
                tt("ocr_coordinates", torch.float32),
                tt("ocr_features", torch.float32))
            ques_emb = ref.encoder.shared(tt("input_ids", torch.long))
            emb = torch.cat([ques_emb, ocr_emb, obj_emb], dim=1)
            mask = torch.cat([
                tt("src_attention_mask", torch.long),
                tt("ocr_attention_mask", torch.long),
                tt("obj_attention_mask", torch.long)], dim=1)
            bias = ref.rel2Dbias(
                emb, mask, tt("ocr_coordinates", torch.float32),
                L_Q_SAL, L_OCR_SAL)
            enc_out = ref.encoder(
                attention_mask=mask, inputs_embeds=emb, position_bias=bias
            ).last_hidden_state
            ys = torch.full((b, 1), 1, dtype=torch.long)
            break_signal = torch.zeros_like(ys)
            for _ in range(SAL_MAX_LEN - 1):
                out = ref.decode(ys, enc_out, mask == 0)
                nxt = torch.argmax(ref.lm_head(out)[:, -1], dim=-1)
                break_signal = torch.where(nxt == 2, 1, break_signal)
                ys = torch.cat([ys, nxt.unsqueeze(1)], dim=1)
                if torch.all(break_signal):
                    break

    times = []
    for it in range(3):  # first run doubles as warmup
        t0 = time.perf_counter()
        one_run()
        times.append(time.perf_counter() - t0)
        log(f"cpu reference run {it}: {times[-1]:.1f}s")
    sps = b / float(np.median(times[1:] or times))
    import json as _json

    _json.dump({"batch": b, "samples_per_sec": sps}, open(CPU_BASELINE, "w"))
    log(f"cpu phoneme reference (warmed, median): {sps:.3f} samples/s")
    return sps


def main_sal():
    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    from phoneme_vqa_tpu.config import Config
    from phoneme_vqa_tpu.models.customized import decoder_config_from_yaml
    from phoneme_vqa_tpu.models.generate import make_generate_fn
    from phoneme_vqa_tpu.models.phoneme import PhonemeSaL
    from phoneme_vqa_tpu.models.customized import CustomizedSaLConfig
    from phoneme_vqa_tpu.models.sal import SaL_config

    cfg_yaml = Config({
        "t5_vocab_size": V, "DTYPE": "bfloat16", "n_head": 12,
        "num_decoder_layers": 4, "ocr_hidden": 512, "obj_hidden": 2048,
        "max_q_length": L_Q_SAL, "max_ocr_length": L_OCR_SAL,
    })
    base = SaL_config().build(cfg_yaml)
    cfg = CustomizedSaLConfig(
        t5=base.t5, ocr_hidden=512, obj_hidden=2048,
        max_ques=L_Q_SAL, max_ocr=L_OCR_SAL,
        decoder=decoder_config_from_yaml(
            cfg_yaml, base.t5, tgt_vocab_size=FLAT_VOCAB,
            pad_id=0, bos_id=1, eos_id=2,
        ),
    )
    model = PhonemeSaL(cfg)
    batch = sal_batch(BATCH, V)
    log(f"devices: {jax.devices()}")

    t0 = time.perf_counter()
    abstract = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        {k: v[:1] for k, v in batch.items()},
        np.zeros((1, 2), np.int32), np.ones((1, 2), np.int32),
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
    log(f"host init + H2D: {time.perf_counter() - t0:.1f}s")

    generate = make_generate_fn(model, SAL_MAX_LEN)
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
    log(f"PhonemeSaL flat decode: {sps:.1f} samples/s "
        f"(p50 {batch_ms:.1f} ms/batch of {BATCH}, len {SAL_MAX_LEN})")
    baseline = cpu_reference_phoneme_sal(BATCH)
    log(f"vs reference CPU {baseline:.3f}/s = {sps/baseline:.0f}x")
    print(
        '{"metric": "phoneme_sal_eval_decode_samples_per_sec_per_chip", '
        f'"value": {sps:.2f}, "unit": "samples/sec/chip", '
        f'"p50_batch_ms": {batch_ms:.2f}, '
        f'"vs_baseline": {sps/baseline:.2f}}}'
    )


if __name__ == "__main__":
    if "--family" in sys.argv and "sal" in sys.argv:
        main_sal()
    else:
        main()
