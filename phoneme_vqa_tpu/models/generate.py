"""Generic jittable greedy generation over any fusion model.

Every model in the framework exposes the same three-method surface:
``fuse(batch)`` (modality fusion), ``encode_for_generate(batch, max_len)``
(encoder + decode-cache init) and ``decode_step(tokens, cache, i, ...)``.
This wraps them into one whole-sequence greedy program (encoder + KV-cached
`lax.while_loop`) compiled as a single XLA executable.
"""

from __future__ import annotations

from ..decode.greedy import greedy_decode, multi_head_greedy_decode


def make_generate_fn(
    model, max_length: int, bos_id=None, eos_id=None, pad_id=None,
    with_scores: bool = False,
):
    t5c = model.cfg.t5
    bos = t5c.decoder_start_token_id if bos_id is None else bos_id
    eos = t5c.eos_token_id if eos_id is None else eos_id
    pad = t5c.pad_token_id if pad_id is None else pad_id

    def generate(params, batch):
        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )

        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, full_bias, enc_mask,
                method=type(model).decode_step,
            )

        batch_size = enc_mask.shape[0]
        return greedy_decode(
            step, cache, batch_size, max_length, bos, eos, pad,
            with_scores=with_scores,
        )

    return generate


def make_sample_generate_fn(
    model, max_length: int, temperature: float = 1.0, top_k: int = 0,
    top_p: float = 1.0, seed: int = 0, bos_id=None, eos_id=None, pad_id=None,
    with_scores: bool = False,
):
    """Stochastic generation (``SAMPLE: true`` + TEMPERATURE/TOP_K/TOP_P):
    the greedy whole-sequence program with categorical sampling over
    temperature/top-k/nucleus-filtered logits. Deterministic per (seed,
    step); temperature 0 or top_k 1 degenerate to greedy.

    ``generate(params, batch, rng=None)`` — pass a per-call PRNG key so
    repeated calls on the same input draw DIFFERENT noise (diverse answers /
    self-consistency voting); ``None`` falls back to the fixed ``seed``
    (deterministic across calls, for tests)."""
    from ..decode.sample import sample_decode

    t5c = model.cfg.t5
    bos = t5c.decoder_start_token_id if bos_id is None else bos_id
    eos = t5c.eos_token_id if eos_id is None else eos_id
    pad = t5c.pad_token_id if pad_id is None else pad_id

    def generate(params, batch, rng=None):
        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )

        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, full_bias, enc_mask,
                method=type(model).decode_step,
            )

        return sample_decode(
            step, cache, enc_mask.shape[0], max_length, bos, eos, pad,
            seed=seed, temperature=temperature, top_k=top_k, top_p=top_p,
            rng=rng, with_scores=with_scores,
        )

    return generate


def make_speculative_generate_fn(
    model, max_length: int, spec_k: int, bos_id=None, eos_id=None, pad_id=None,
    with_scores: bool = False,
):
    """Greedy generation with OCR prompt-lookup speculative decoding
    (``SPEC_DECODE: K``): token-for-token identical output to
    `make_generate_fn`, fewer sequential decode steps when the answer copies
    source text. Requires the stock-T5-decoder families
    (``model.spec_decode_supported``)."""
    from ..decode.speculative import (
        make_prompt_lookup_draft,
        speculative_greedy_decode,
    )

    if not getattr(type(model), "spec_decode_supported", False):
        raise ValueError(
            f"{type(model).__name__} uses a custom decoder cache — "
            "SPEC_DECODE supports the stock T5-decoder families"
        )
    t5c = model.cfg.t5
    bos = t5c.decoder_start_token_id if bos_id is None else bos_id
    eos = t5c.eos_token_id if eos_id is None else eos_id
    pad = t5c.pad_token_id if pad_id is None else pad_id

    # (ids key, mask key) pairs drafts may copy from, concatenated;
    # an explicit ``spec_source_ids`` batch key overrides them (callers can
    # scope the lookup corpus without touching the encoder inputs)
    SOURCES = (
        ("spec_source_ids", "spec_source_mask"),
        ("tokenized_ocr", "ocr_attention_mask"),
        ("input_ids", "src_attention_mask"),
    )

    def generate(params, batch):
        import jax.numpy as jnp

        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )
        if "spec_source_ids" in batch:
            parts = [(batch["spec_source_ids"], batch.get("spec_source_mask"))]
        else:
            parts = [
                (batch[k], batch.get(m)) for k, m in SOURCES[1:] if k in batch
            ]
        if not parts:
            raise ValueError(
                "SPEC_DECODE needs source token ids in the batch "
                f"(one of {[k for k, _ in SOURCES]})"
            )
        source = jnp.concatenate([p for p, _ in parts], axis=1)
        mask = jnp.concatenate(
            [
                (jnp.ones_like(p) if m is None else m)
                for p, m in parts
            ],
            axis=1,
        )
        draft = make_prompt_lookup_draft(source, spec_k - 1, pad, mask)

        def step_k(tokens, cache, pos):
            return model.apply(
                {"params": params}, tokens, cache, pos, full_bias, enc_mask,
                method=type(model).decode_step_k,
            )

        return speculative_greedy_decode(
            step_k, draft, cache, enc_mask.shape[0], max_length, spec_k,
            bos, eos, pad, with_scores=with_scores,
        )

    return generate


def make_beam_generate_fn(
    model, max_length: int, num_beams: int, bos_id=None, eos_id=None, pad_id=None,
    with_scores: bool = False,
):
    """Beam-search generation: encode once, expand cache/mask to B*K beams."""
    from ..decode.beam import _expand_to_beams, beam_decode

    t5c = model.cfg.t5
    bos = t5c.decoder_start_token_id if bos_id is None else bos_id
    eos = t5c.eos_token_id if eos_id is None else eos_id
    pad = t5c.pad_token_id if pad_id is None else pad_id

    def generate(params, batch):
        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )
        batch_size = enc_mask.shape[0]
        cache = _expand_to_beams(cache, num_beams)
        enc_mask_k = _expand_to_beams(enc_mask, num_beams)

        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, full_bias, enc_mask_k,
                method=type(model).decode_step,
            )

        return beam_decode(
            step, cache, batch_size, num_beams, max_length, bos, eos, pad,
            with_scores=with_scores,
        )

    return generate


def make_multi_head_beam_generate_fn(
    model, max_length: int, num_beams: int, bos_id: int, eos_id: int,
    pad_id: int, stop_component: int = 0, with_scores: bool = False,
):
    from ..decode.beam import _expand_to_beams, multi_head_beam_decode

    def generate(params, batch):
        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )
        batch_size = enc_mask.shape[0]
        cache = _expand_to_beams(cache, num_beams)
        enc_mask_k = _expand_to_beams(enc_mask, num_beams)

        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, full_bias, enc_mask_k,
                method=type(model).decode_step,
            )

        return multi_head_beam_decode(
            step, cache, batch_size, num_beams, max_length, bos_id, eos_id,
            pad_id, stop_component, with_scores=with_scores,
        )

    return generate


def make_multi_head_generate_fn(
    model, max_length: int, num_components: int, bos_id: int, eos_id: int,
    pad_id: int, stop_component: int = 0, with_scores: bool = False,
):
    """Greedy generation over component-tuple streams (phoneme triples)."""

    def generate(params, batch):
        cache, full_bias, enc_mask = model.apply(
            {"params": params}, batch, max_length,
            method=type(model).encode_for_generate,
        )

        def step(tokens, cache, i):
            return model.apply(
                {"params": params}, tokens, cache, i, full_bias, enc_mask,
                method=type(model).decode_step,
            )

        batch_size = enc_mask.shape[0]
        return multi_head_greedy_decode(
            step, cache, batch_size, max_length, num_components, bos_id,
            eos_id, pad_id, stop_component, with_scores=with_scores,
        )

    return generate
