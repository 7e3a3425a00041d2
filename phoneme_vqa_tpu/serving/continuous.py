"""Continuous batching: slot-based decode with step-boundary refill.

The gathered-batch ``ServingEngine`` runs featurize -> H2D -> prefill -> FULL
decode per batch; a request arriving mid-decode always waits out the whole
decode, and the device idles during host-side batch assembly (measured p50
~600 ms against 77 ms of device decode under load, docs/SERVING.md). This
engine is the canonical TPU serving design instead:

* **S request slots live inside one compiled decode program.** Every slot
  advances one token per device step; slots sit at DIFFERENT sequence
  positions, which the stock T5 cache already supports — the decode step is
  ``decode_step_k`` with K=1, the per-row-position primitive built for
  speculative verification (`models/t5.py: T5Decoder.step_k`).
* **Prefill is decoupled from decode.** New requests are featurized and
  encoded in fixed-size chunks by a separate compiled prefill executable,
  staged, and scattered into free slots by the next decode dispatch (the
  scatter is FUSED into the decode program — with separate executables the
  slot state alternates between two producers whose output layouts differ,
  which measured as a 0.4-4 s executable re-specialization after every
  admission) — a request joins the decode stream at the next step boundary
  instead of the next batch.
* **The decode program runs a fixed HORIZON of steps per dispatch** so the
  ~28 ms per-dispatch tax of this environment is amortized over many steps;
  the horizon bounds refill latency (horizon x step-time), not correctness.
* **No recompiles in steady state**: slot count, chunk size, horizon and all
  array shapes are fixed at warmup; one trash slot absorbs the padding rows
  of partial prefill chunks.

Supported families: ALL NINE — the capability is a per-row-position decode
step (``decode_step_k``), provided by the stock T5 decoder
(`models/t5.py: T5Decoder.step_k`), the custom post-LN decoder
(`models/custom_decoder.py: CustomDecoder.step_k` — Customized*, PhonemeSaL)
and the phoneme triple decoder (`models/phoneme.py:
PhonemeTripleDecoder.step_k` — PhonemeLaTr/PreSTU, the framework's namesake
decode: three heads argmaxed per step, a slot stops when its ONSET emits EOS,
`/root/reference/core/model/PhonemeLaTr.py:198-214`).

Greedy only (the production serving decode); answers equal
``executor.infer``'s exactly in f32 — `tests/test_continuous.py` pins
identity per family. In bf16 the per-row step's different reduction order
can flip near-tie argmaxes (the repo-wide bf16 caveat, README).

The reference has no serving story at all (its closest analog is the
one-shot predict mode, `/root/reference/core/executor/base_executor.py:143`).
"""

from __future__ import annotations

import functools
import math
import queue
import threading
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.logger import get_logger
from .engine import _Request, featurize_requests
from .watchdog import StallWatchdog, fail_future

log = get_logger(__name__)

#: (ids key, mask key) pairs the per-slot speculative draft corpus is built
#: from (same list as models/generate.py's offline SPEC_DECODE)
_SPEC_SOURCES = (
    ("tokenized_ocr", "ocr_attention_mask"),
    ("input_ids", "src_attention_mask"),
)


class ContinuousEngine:
    """Slot-based continuously-batched serving over an executor's model.

    Parameters
    ----------
    executor: constructed executor (weights in place) of ANY of the nine
        families — stock-T5 decoders via ``T5Decoder.step_k``, the
        Customized families via the custom decoder's per-row-position
        window step, the phoneme families via the triple-stream variant
        (the engine keys on ``decode_step_k`` presence and the answer
        vocabulary's bos/eos/pad).
    ocr_df / obj_df: preloaded feature stores (as ``ServingEngine``).
    num_slots: concurrent request slots inside the decode program. Device
        cost per step scales with S, so size it near the expected
        concurrency (the throughput end of the latency/throughput curve).
    prefill_chunk: rows per compiled prefill executable; partial chunks pad
        into a trash slot.
    horizon: decode steps per dispatch (refill granularity; amortizes the
        per-dispatch overhead). serve.py defaults to horizon=20 /
        prefill_chunk=16 — the round-5 grid winner on both flood
        throughput and low-load p50 (docs/probe_cont_config_r5.json);
        the ctor keeps small defaults for cheap ad-hoc engines.
    max_answer_length: decode length cap (same meaning as executor.infer).
    max_queue: -1 auto (4 x num_slots), 0 unbounded, >0 explicit bound.
    spec_k: >1 turns on per-slot SPECULATIVE decoding: every slot verifies
        a spec_k-token prompt-lookup draft window per device step (drafts
        from the request's OCR ++ question ids, `decode/speculative.py`).
        Answers are token-identical to spec_k=0 by the exactness invariant;
        throughput scales with the draft accept rate (answers that copy
        source text). Stock-T5-decoder families only.
    stall_timeout_s: device-stall watchdog — a single decode dispatch (or
        prefill) blocking longer than this fails every in-flight future,
        marks the engine unhealthy (stats()["unhealthy"], /healthz 503) and
        keeps stop() returning. A dead TPU tunnel otherwise hangs
        np.asarray forever. 0 disables. Deadlines are also enforced
        MID-DECODE: a slotted request whose deadline passes is expired at
        the next dispatch boundary and its device slot deactivated.
    """

    def __init__(
        self,
        executor,
        ocr_df: pd.DataFrame,
        obj_df: Optional[pd.DataFrame] = None,
        num_slots: int = 16,
        prefill_chunk: int = 4,
        horizon: int = 8,
        max_answer_length: int = 20,
        max_queue: int = -1,
        warmup: bool = True,
        default_deadline_s: float = 0.0,
        access_log=None,
        confidence: bool = False,
        cache_size: int = 0,
        stall_timeout_s: float = 300.0,
        spec_k: int = 0,
    ):
        model = executor.model
        if not hasattr(type(model), "decode_step_k"):
            raise ValueError(
                f"{type(model).__name__} has no per-row-position decode step "
                "(decode_step_k) — continuous batching needs it; serve this "
                "model with the gathered-batch engine"
            )
        self.executor = executor
        self.ocr_df = ocr_df
        self.obj_df = obj_df
        self.S = int(num_slots)
        self.C = int(prefill_chunk)
        self.horizon = int(horizon)
        self.max_answer_length = int(max_answer_length)
        self.default_deadline_s = float(default_deadline_s)
        self._access_log = access_log
        self.confidence = bool(confidence)
        self._cache_size = int(cache_size)
        self._cache: dict = {}  # (image_id, question) -> resolved answer
        self._cache_hits = 0
        self._id_dtype = ocr_df["image_id"].dtype
        self._known_ids = set(ocr_df["image_id"])
        if obj_df is not None:
            self._known_ids &= set(obj_df["image_id"])
        if not self._known_ids:
            raise ValueError("feature store is empty")
        if max_queue < 0:
            max_queue = 4 * self.S
        self.max_queue = max_queue
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue(
            maxsize=max_queue
        )
        self._stopped = False
        self._unhealthy: Optional[str] = None
        self._watchdog = StallWatchdog(stall_timeout_s, self._on_stall)
        self._lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._reload_lock = threading.Lock()  # serialize /reload + watcher
        self._reload_req = None  # (event, err_list) set under _reload_lock
        self._reloads = 0
        self._served = 0
        self._failed = 0
        self._expired = 0
        self._service_ewma = 0.0  # slotted->finished seconds, viability gate
        self._dispatches = 0
        self._latencies_ms: list = []
        self._slot_steps = 0  # slot-steps decoded (occupancy numerator)
        self._total_steps = 0  # S x steps (occupancy denominator)
        self._spec_tokens = 0  # tokens emitted by speculative acceptance
        self._spec_steps = 0  # device steps a live slot actually consumed

        # components per decode step (1 = token stream, 3 = phoneme triples)
        self._ncomp = int(getattr(type(model), "decode_components", 1))
        ids = getattr(model, "decode_token_ids", None)
        if ids is None:  # stock T5 families: the backbone vocabulary's ids
            t5c = model.cfg.t5
            ids = (t5c.decoder_start_token_id, t5c.eos_token_id, t5c.pad_token_id)
        self._bos, self._eos, self._pad = (int(i) for i in ids)

        from .encoding_cache import EncodingCache

        # frozen-ViT encoding table (VIT_CACHE in serve mode): built BEFORE
        # warmup so the compiled prefill takes the vit_encodings input —
        # with the cache on, every chunk rides that one program shape
        self._enc_cache = EncodingCache.maybe_build(executor)

        # SPEC_K > 1: per-slot speculative decoding — each slot verifies a
        # K-token prompt-lookup draft window per device step (decode/
        # speculative.py's exactness invariant holds per slot: drafts only
        # change how many steps an answer takes, never its tokens)
        self.spec_k = int(spec_k or 0)
        if self.spec_k > 1:
            why = None
            if self._ncomp != 1:
                why = "component-tuple streams decode one triple per step"
            elif not getattr(type(model), "spec_decode_supported", False):
                why = (
                    "drafts are backbone-vocab ids, vocabulary-mismatched "
                    "with the pluggable answer tokenizer"
                )
            elif self._chunk_src(
                self._chunk_batch([self._dummy_request()])
            ) is None:
                why = "featurized batch carries no draft source ids"
            if why is not None:
                log.warning(f"(!) continuous spec_k={spec_k} ignored: {why}")
                self.spec_k = 0

        self._params = executor._inference_params()
        self._build_compiled()
        # host mirrors of slot occupancy: request + emitted tokens per slot.
        # A slot is assigned at staging time but only LIVE once its prefilled
        # chunk has been scattered by an advance call — tokens are read for
        # live slots only.
        self._slot_req: List[Optional[_Request]] = [None] * self.S
        self._slot_toks: List[List[int]] = [[] for _ in range(self.S)]
        self._slot_lps: List[List[float]] = [[] for _ in range(self.S)]
        self._live: List[bool] = [False] * self.S
        self._free = list(range(self.S))
        self._waiting: List[_Request] = []
        self._staged: List[tuple] = []  # (chunk_cache, chunk_mask, src, valid, slot_ids)
        if warmup:
            self._warmup()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- compiled programs ----------------------------------------------------

    def _build_compiled(self):
        model = self.executor.model
        maxl = self.max_answer_length
        eos, pad = self._eos, self._pad

        self._prefill = jax.jit(
            lambda params, mb: model.apply(
                {"params": params}, mb, maxl,
                method=type(model).encode_for_generate,
            )
        )

        # ONE fused program per dispatch: (optionally) scatter a prefilled
        # chunk into slots, then run `horizon` decode steps. Fusing the
        # insert into the decode program matters beyond a dispatch saved:
        # with separate insert/decode executables the state buffers
        # alternate between two producers, whose output LAYOUTS may differ —
        # measured here as a ~0.4-4 s executable re-specialization after
        # EVERY admission (vs ~40 ms steady decode). One producer, one
        # layout, zero steady-state recompiles.
        spec = self.spec_k  # 0/1 = plain one-token steps

        @functools.partial(jax.jit, donate_argnums=(1,))
        def advance(params, state, full_bias, chunk_cache, chunk_mask,
                    chunk_src, chunk_valid, slots, kill):
            st = dict(state)
            # deadline-expired slots deactivate BEFORE the insert, so a slot
            # expired and re-admitted in the same dispatch comes back live
            st["active"] = st["active"] & ~kill
            for n in ("k", "v", "ck", "cv"):
                st[n] = st[n].at[:, slots].set(chunk_cache[n])
            st["enc_mask"] = st["enc_mask"].at[slots].set(chunk_mask)
            st["pos"] = st["pos"].at[slots].set(0)
            st["cur"] = st["cur"].at[slots].set(self._bos)
            if spec > 1:
                st["src"] = st["src"].at[slots].set(chunk_src)
                st["valid"] = st["valid"].at[slots].set(chunk_valid)
                st["prev"] = st["prev"].at[slots].set(self._bos)
            active = st["active"].at[slots].set(True)
            st["active"] = active.at[self.S].set(False)  # trash never decodes

            ncomp = self._ncomp

            def spec_body(st, _):
                # per-slot speculative step (`decode/speculative.py` body at
                # per-slot state): draft K-1 continuations from the slot's
                # source ids, verify the window in ONE decode_step_k, accept
                # the longest matching prefix — 1..K tokens per device step.
                from ..decode.speculative import draft_from_pair

                cache = {n: st[n] for n in ("k", "v", "ck", "cv")}
                drafts = draft_from_pair(
                    st["src"], st["valid"], st["cur"], st["prev"],
                    st["pos"] > 0, spec - 1, pad,
                )
                window = jnp.concatenate(
                    [st["cur"][:, None], drafts], axis=1
                )  # (S+1, K)
                logits, cache = model.apply(
                    {"params": params}, window, cache, st["pos"],
                    full_bias, st["enc_mask"],
                    method=type(model).decode_step_k,
                )
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                match = (window[:, 1:] == greedy[:, :-1]).astype(jnp.int32)
                n_acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                n_acc = jnp.minimum(n_acc, (maxl - 1) - st["pos"])
                jj = jnp.arange(spec, dtype=jnp.int32)[None, :]
                toks = jnp.where(jj < n_acc[:, None], greedy, pad)
                # cut after the first EOS within the accepted run (kept)
                is_eos = (toks == eos).astype(jnp.int32)
                eos_before = jnp.cumsum(is_eos, axis=1) - is_eos
                keep = (
                    (jj < n_acc[:, None])
                    & (eos_before == 0)
                    & st["active"][:, None]
                )
                toks = jnp.where(keep, toks, pad)
                n_eff = jnp.sum(keep.astype(jnp.int32), axis=1)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tok_lp = jnp.take_along_axis(
                    lp, greedy[..., None], axis=2
                )[..., 0]  # (S+1, K)
                tok_lp = jnp.where(keep, tok_lp, 0.0)
                new_pos = st["pos"] + n_eff
                active = (
                    st["active"]
                    & ~jnp.any(keep & (toks == eos), axis=1)
                    & (new_pos < maxl - 1)
                )
                # slide (prev, cur) to the last two tokens at the new pos
                last = jnp.take_along_axis(
                    greedy, jnp.maximum(n_eff - 1, 0)[:, None], axis=1
                )[:, 0]
                before = jnp.take_along_axis(
                    greedy, jnp.maximum(n_eff - 2, 0)[:, None], axis=1
                )[:, 0]
                cur2 = jnp.where(n_eff > 0, last, st["cur"])
                prev2 = jnp.where(
                    n_eff >= 2, before,
                    jnp.where(n_eff == 1, st["cur"], st["prev"]),
                )
                st2 = dict(st, **cache, cur=cur2, prev=prev2, pos=new_pos,
                           active=active)
                return st2, (toks, n_eff, tok_lp)

            def body(st, _):
                cache = {n: st[n] for n in ("k", "v", "ck", "cv")}
                cur = st["cur"][:, None] if ncomp == 1 else st["cur"][:, None, :]
                logits, cache = model.apply(
                    {"params": params}, cur, cache, st["pos"],
                    full_bias, st["enc_mask"],
                    method=type(model).decode_step_k,
                )
                # chosen-token log-prob (greedy_decode's chosen_logprob
                # semantics: f32 log_softmax); always computed — one
                # vocab-size reduction per step keeps ONE program whether or
                # not the confidence response format is on
                if ncomp == 1:
                    tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                    tok = jnp.where(st["active"], tok, pad)
                    lp = jax.nn.log_softmax(
                        logits[:, 0].astype(jnp.float32), axis=-1
                    )
                    tok_lp = jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]
                    stop_tok = tok
                else:
                    # component tuple: argmax each head independently; the
                    # slot's step log-prob is the SUM over components
                    # (multi_head_greedy_decode's with_scores semantics)
                    tok = jnp.stack(
                        [jnp.argmax(l[:, 0], axis=-1).astype(jnp.int32)
                         for l in logits],
                        axis=-1,
                    )  # (S+1, ncomp)
                    tok = jnp.where(st["active"][:, None], tok, pad)
                    tok_lp = sum(
                        jnp.take_along_axis(
                            jax.nn.log_softmax(
                                l[:, 0].astype(jnp.float32), axis=-1
                            ),
                            tok[:, c][:, None], axis=1,
                        )[:, 0]
                        for c, l in enumerate(logits)
                    )
                    stop_tok = tok[:, 0]  # onset EOS ends the row
                new_pos = st["pos"] + st["active"].astype(jnp.int32)
                # a slot stops on EOS or when it has emitted maxl-1 tokens
                # (executor.infer's greedy cap: emissions fill positions
                # 1..maxl-1 after the start token)
                active = (
                    st["active"] & (stop_tok != eos) & (new_pos < maxl - 1)
                )
                st2 = dict(st, **cache)
                keep = st["active"] if ncomp == 1 else st["active"][:, None]
                st2["cur"] = jnp.where(keep, tok, st["cur"])
                st2["pos"] = new_pos
                st2["active"] = active
                return st2, (tok, tok_lp)

            if spec > 1:
                st, (toks, neff, lps) = jax.lax.scan(
                    spec_body, st, None, length=self.horizon
                )
                # toks/lps (horizon, S+1, K); neff (horizon, S+1)
                return st, toks, neff, lps
            st, (toks, lps) = jax.lax.scan(body, st, None, length=self.horizon)
            return st, toks, lps  # toks (horizon, S+1[, ncomp]); lps (horizon, S+1)

        self._advance = advance
        self._full_bias = None  # set at warmup (constant per max_len)
        self._state = None
        # a persistent dummy chunk (built at warmup) feeds advance on
        # dispatches with nothing to insert (slots = all-trash)
        self._dummy_chunk = None
        # (src, valid) filler for the chunk draft-corpus args: real-width at
        # warmup when spec is on, 1-wide unused placeholders otherwise
        self._dummy_srcpair = (
            jnp.zeros((self.C, 1), jnp.int32),
            jnp.zeros((self.C, 1), bool),
        )
        self._trash_slots = jnp.full((self.C,), self.S, jnp.int32)
        self._no_kill = jnp.zeros((self.S + 1,), bool)
        self._kill_pending: set = set()  # slot ids expired since last dispatch

    def _unpack_advance(self, out):
        """(state, toks, n_eff-or-None, lps) across the spec/plain returns."""
        if self.spec_k > 1:
            return out
        st, toks, lps = out
        return st, toks, None, lps

    def _dummy_request(self) -> _Request:
        return _Request(next(iter(self._known_ids)), "")

    def _featurize(self, reqs):
        ds = featurize_requests(self.executor, self.ocr_df, self.obj_df, reqs)
        if self._enc_cache is not None:
            self._enc_cache.apply(ds, [r.image_id for r in reqs])
        return ds

    def _chunk_batch(self, reqs):
        """Featurize reqs (<= C) and pad the model batch to exactly C rows."""
        from ..data.loader import batch_iterator

        ds = self._featurize(reqs)
        if len(ds) != len(reqs):
            raise RuntimeError(
                f"featurization dropped rows: {len(ds)} != {len(reqs)}"
            )
        batch, _ = next(batch_iterator(ds, self.C, pad_final=True))
        return self.executor._model_batch(batch)

    def _chunk_src(self, mb):
        """(src, valid) draft-corpus arrays (C, Ls) from a featurized chunk,
        or None when the family's batch carries no source ids."""
        parts = [(mb[k], mb.get(m)) for k, m in _SPEC_SOURCES if k in mb]
        if not parts:
            return None
        src = np.concatenate(
            [np.asarray(p, np.int32) for p, _ in parts], axis=1
        )
        valid = np.concatenate(
            [
                (np.ones_like(np.asarray(p), bool) if m is None
                 else np.asarray(m, bool))
                for p, m in parts
            ],
            axis=1,
        )
        return jnp.asarray(src), jnp.asarray(valid)

    def _warmup(self):
        """Compile prefill + advance and allocate the slot state."""
        mb = self._chunk_batch([self._dummy_request()])
        cache, full_bias, enc_mask = self._prefill(self._params, mb)
        self._full_bias = full_bias
        self._dummy_chunk = (cache, enc_mask)  # persistent all-trash filler
        S1 = self.S + 1

        def alloc(x):
            # chunk arrays carry rows on the slot axis: (L, C, ...) -> (L, S+1, ...)
            shape = list(x.shape)
            ax = 1 if x.ndim >= 3 else 0
            shape[ax] = S1
            return jnp.zeros(shape, x.dtype)

        state = {n: alloc(cache[n]) for n in ("k", "v", "ck", "cv")}
        state["enc_mask"] = jnp.zeros((S1,) + enc_mask.shape[1:], enc_mask.dtype)
        state["pos"] = jnp.zeros((S1,), jnp.int32)
        cur_shape = (S1,) if self._ncomp == 1 else (S1, self._ncomp)
        state["cur"] = jnp.full(cur_shape, self._bos, jnp.int32)
        state["active"] = jnp.zeros((S1,), bool)
        if self.spec_k > 1:
            src, valid = self._chunk_src(mb)
            ls = src.shape[1]
            state["src"] = jnp.zeros((S1, ls), jnp.int32)
            state["valid"] = jnp.zeros((S1, ls), bool)
            state["prev"] = jnp.full((S1,), self._bos, jnp.int32)
            self._dummy_srcpair = (
                jnp.zeros((self.C, ls), jnp.int32),
                jnp.zeros((self.C, ls), bool),
            )
        d_src, d_valid = self._dummy_srcpair
        state, toks, _, _ = self._unpack_advance(self._advance(
            self._params, state, self._full_bias, cache, enc_mask,
            d_src, d_valid, self._trash_slots, self._no_kill,
        ))
        np.asarray(toks)  # host-materialize: block_until_ready is a no-op
        # on the remote backend (CLAUDE.md)
        # Call advance a SECOND time on its own donated output: steady-state
        # calls consume advance-produced state whose layout differs from the
        # fresh alloc above, and the backend re-specializes the executable on
        # first sight of it — measured 46 s through the tunnel. Pay that at
        # warmup, not on the first real request.
        state, toks, _, _ = self._unpack_advance(self._advance(
            self._params, state, self._full_bias, cache, enc_mask,
            d_src, d_valid, self._trash_slots, self._no_kill,
        ))
        np.asarray(toks)
        self._state = state

    # -- client surface ---------------------------------------------------------

    def submit(self, image_id, question: str, deadline_s: float = None,
               adapter: str = None):
        # signature-compatible with ServingEngine.submit so the serve.py
        # HTTP/stdin front-ends drive either engine; adapters are a
        # gathered-engine feature (serve.py refuses --adapter --continuous)
        if adapter is not None:
            raise KeyError(
                f"unknown adapter {adapter!r} (continuous engine serves "
                "base only)"
            )
        with self._lock:
            if self._unhealthy is not None:
                raise RuntimeError(f"engine unhealthy: {self._unhealthy}")
            if self._stopped:
                raise RuntimeError("engine stopped")
        if self._id_dtype.kind in "if":
            try:
                coerced = self._id_dtype.type(image_id)
                if float(coerced) == float(image_id):
                    image_id = coerced
            except (TypeError, ValueError):
                pass
        if image_id not in self._known_ids:
            raise KeyError(f"unknown image_id {image_id!r}")
        if self._cache_size:
            key = (image_id, question)
            hit = object()  # sentinel: None is not a valid cached answer
            answer = hit
            with self._stats_lock:
                if key in self._cache:
                    answer = self._cache.pop(key)
                    self._cache[key] = answer  # move-to-end: LRU
                    self._cache_hits += 1
            if answer is not hit:
                self._record(_Request(image_id, question), "cached")
                from concurrent.futures import Future
                fut = Future()
                fut.set_result(answer)
                return fut
        if deadline_s is None and self.default_deadline_s > 0:
            deadline_s = self.default_deadline_s
        deadline = time.monotonic() + deadline_s if deadline_s else None
        req = _Request(image_id, question, deadline)
        with self._lock:
            if self._unhealthy is not None:
                raise RuntimeError(f"engine unhealthy: {self._unhealthy}")
            if self._stopped:
                raise RuntimeError("engine stopped")
            # The Queue maxsize alone cannot bound the system: the worker
            # drains it into self._waiting between dispatches, so qsize()
            # alone is ~0 under load and every arrival would be admitted
            # into an unbounded backlog (measured: p50 14.8 s at 2x
            # overload with max_queue=64 — no backpressure at all). Bound
            # queued + drained-but-unslotted together; staged chunks
            # (<= 2*C) and live slots (S) are the only extra in-system
            # slop past max_queue.
            if self.max_queue and (
                self._queue.qsize() + len(self._waiting) >= self.max_queue
            ):
                raise RuntimeError(
                    f"serving queue full ({self.max_queue} pending)"
                )
            try:
                self._queue.put_nowait(req)
            except queue.Full:
                raise RuntimeError(
                    f"serving queue full ({self._queue.maxsize} pending)"
                ) from None
        return req.future

    def answer(self, image_id, question: str, timeout=None, deadline_s=None):
        return self.submit(image_id, question, deadline_s).result(timeout=timeout)

    def stats(self) -> dict:
        with self._stats_lock:
            lats = sorted(self._latencies_ms)
            pct = (
                lambda p: lats[min(len(lats) - 1, int(p * len(lats)))]
                if lats else None
            )
            occ = (
                self._slot_steps / self._total_steps
                if self._total_steps else 0.0
            )
            return {
                "served": self._served,
                "failed": self._failed,
                "expired": self._expired,
                "unhealthy": self._unhealthy,
                "decode_dispatches": self._dispatches,
                "reloads": self._reloads,
                "cache_hits": self._cache_hits,
                "slot_occupancy": round(occ, 3),
                "service_ewma_s": round(self._service_ewma, 3),
                **(
                    {
                        "spec_k": self.spec_k,
                        # mean accepted tokens per device step a live slot
                        # consumed (1.0 = no draft ever accepted; up to
                        # spec_k) — the measured accept rate
                        "spec_tokens_per_step": round(
                            self._spec_tokens / self._spec_steps, 3
                        ) if self._spec_steps else None,
                    }
                    if self.spec_k > 1 else {}
                ),
                "queue_depth": self._queue.qsize(),
                "p50_ms": pct(0.50),
                "p95_ms": pct(0.95),
                **(
                    {"vit_cache": self._enc_cache.stats()}
                    if self._enc_cache is not None
                    else {}
                ),
            }

    def reload(self, loadtype: str = "best") -> dict:
        """Hot-swap the serving weights with NO downtime and ANSWER-ATOMIC
        semantics. The slow checkpoint restore runs on this (caller) thread
        while the worker keeps serving on the old weights — same as the
        gathered engine's reload. Then a short drain barrier on the worker
        pauses admission, lets live slots finish (bounded by
        max_answer_length steps), and swaps: a slot's prefill and decode
        always use ONE param tree, never a mix (in-flight KV caches were
        computed under the old weights, so swapping mid-slot would hand the
        new decoder another model's cache). Requests arriving during the
        barrier queue up and decode under the new weights."""
        with self._lock:
            if self._stopped:
                raise RuntimeError("engine stopped")
        t0 = time.monotonic()
        with self._reload_lock:
            # restore on THIS thread: old weights keep serving meanwhile
            self.executor._load_trained_checkpoint(loadtype)
            ev = threading.Event()
            err: list = []
            self._reload_req = (ev, err)
            ev.wait()
        if err:
            raise err[0]
        with self._stats_lock:
            self._cache.clear()  # entries are stale under the new weights
            self._reloads += 1
        ms = (time.monotonic() - t0) * 1e3
        log.info(f"## hot-reloaded {loadtype}_ckp in {ms:.0f} ms (continuous)")
        return {"reloaded": loadtype, "ms": round(ms, 1)}

    def _finish_reload(self):
        """Runs on the worker thread at the drain barrier (no live slots, no
        staged chunks): swap params, recompute the param-derived constants
        (full_bias, dummy chunk), and pay any executable re-specialization
        for the new param buffers with one all-trash advance before traffic
        resumes."""
        ev, err = self._reload_req
        try:
            self._params = self.executor._inference_params()
            if self._enc_cache is not None:
                self._enc_cache.flush()  # stale under the new ViT weights
            mb = self._chunk_batch([self._dummy_request()])
            cache, full_bias, enc_mask = self._prefill(self._params, mb)
            self._full_bias = full_bias
            self._dummy_chunk = (cache, enc_mask)
            d_src, d_valid = self._dummy_srcpair
            state, toks, _, _ = self._unpack_advance(self._advance(
                self._params, self._state, self._full_bias, cache, enc_mask,
                d_src, d_valid, self._trash_slots, self._no_kill,
            ))
            np.asarray(toks)
            self._state = state
        except Exception as e:  # pragma: no cover - surfaced to the caller
            err.append(e)
        finally:
            self._reload_req = None
            ev.set()

    @property
    def unhealthy_reason(self) -> Optional[str]:
        """Non-None once the stall watchdog (or a raising device dispatch)
        declared the engine dead — ``/healthz`` turns 503."""
        return self._unhealthy

    def stop(self):
        """Drain and stop. ALWAYS returns: a worker stuck on a dead device
        cannot be joined — once the watchdog declares the stall (or it
        already has), the stuck daemon thread is abandoned."""
        with self._lock:
            already = self._stopped
            self._stopped = True
        if already and not self._worker.is_alive():
            return
        while self._worker.is_alive():
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                pass  # worker drains it (or is stuck — watchdog decides)
            self._worker.join(timeout=0.5)
            if self._unhealthy:
                self._worker.join(timeout=1.0)
                if self._worker.is_alive():
                    log.warning(
                        "(!) stop(): abandoning worker stuck on a dead "
                        "device (daemon thread)"
                    )
                break
        self._watchdog.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- failure handling -----------------------------------------------------

    def _on_stall(self, label: str, waited: float) -> None:
        """Watchdog callback (monitor thread): the worker is stuck inside a
        device call. Fail everything in flight so no client waits forever;
        the worker, if it ever unblocks, sees _unhealthy and exits."""
        self._fail_inflight(RuntimeError(
            f"device stall: {label} blocked {waited:.0f}s (dead TPU tunnel?)"
        ))

    def _fail_inflight(self, exc: Exception) -> None:
        """Mark unhealthy and resolve every in-flight/queued future with
        ``exc``. Idempotent; callable from the watchdog monitor thread
        (worker stuck) or the worker thread (device dispatch raised)."""
        with self._lock:
            if self._unhealthy is not None:
                return
            self._unhealthy = str(exc)
            self._stopped = True
        n = 0
        for s in range(self.S):
            req = self._slot_req[s]
            if req is not None:
                n += fail_future(req.future, exc)
        for req in self._waiting:
            n += fail_future(req.future, exc)
        while True:  # queued but not yet drained by the worker
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                n += fail_future(item.future, exc)
        rl = self._reload_req
        if rl is not None:  # a reload caller is blocked on the barrier
            ev, err = rl
            err.append(RuntimeError(f"engine unhealthy: {exc}"))
            ev.set()
        with self._stats_lock:
            self._failed += n
        log.error(
            f"(!!) engine unhealthy ({exc}) — failed {n} in-flight "
            "request(s); submits now reject"
        )

    # -- worker -------------------------------------------------------------------

    def _record(self, req, status, **extra):
        if self._access_log is None:
            return
        image_id = req.image_id
        rec = {
            "ts": round(time.time(), 3),
            "image_id": image_id.item() if hasattr(image_id, "item") else image_id,
            "question_chars": len(req.question),
            "status": status,
            "latency_ms": round((time.monotonic() - req.t_submit) * 1e3, 3),
            **extra,
        }
        try:
            self._access_log(rec)
        except Exception as e:
            log.warning(f"(!) access-log sink raised {e!r} — disabled")
            self._access_log = None

    def _drain_queue(self, block: bool) -> bool:
        """Move queued requests to the waiting list; returns False on the
        stop sentinel."""
        try:
            item = self._queue.get(timeout=0.05) if block else self._queue.get_nowait()
        except queue.Empty:
            return True
        while True:
            if item is None:
                return False
            if item.future.set_running_or_notify_cancel():
                self._waiting.append(item)
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return True

    def _admit(self):
        """Prefill + insert waiting requests into free slots, chunk by chunk."""
        now = time.monotonic()
        live = []
        n_expired = 0
        # viability gate: a request whose REMAINING deadline is under the
        # measured per-request service time (EWMA of slotted->finished)
        # would only expire mid-decode after burning slot steps — shed it
        # while queued instead. Measured (round 5, sustained 2x overload,
        # 3 s deadline): without this every slotted request expired
        # mid-decode and goodput collapsed to ~4/s against a ~30/s
        # capacity; shedding early keeps slots on answers that can finish.
        min_left = self._service_ewma
        for r in self._waiting:
            if r.deadline and r.deadline - now < min_left:
                self._record(r, "expired")
                r.future.set_exception(TimeoutError(
                    "deadline exceeded while queued" if r.deadline < now
                    else f"deadline cannot be met: {r.deadline - now:.2f}s "
                         f"left < {min_left:.2f}s estimated service time"
                ))
                n_expired += 1
            else:
                live.append(r)
        if n_expired:
            with self._stats_lock:
                self._expired += n_expired
        self._waiting = live
        while self._waiting and self._free and len(self._staged) < 2:
            take = min(len(self._waiting), len(self._free), self.C)
            reqs, self._waiting = self._waiting[:take], self._waiting[take:]
            try:
                mb = self._chunk_batch(reqs)
            except Exception as e:
                log.warning(f"featurization of {len(reqs)} requests failed: {e!r}")
                for r in reqs:
                    self._record(r, "error", error=repr(e))
                    r.future.set_exception(e)
                with self._stats_lock:
                    self._failed += len(reqs)
                continue
            # prefill dispatches async; the chunk is STAGED and scattered by
            # the next advance call (the fused program), so slot state only
            # ever has one producer
            with self._watchdog.guard("prefill dispatch"):
                cache, _, enc_mask = self._prefill(self._params, mb)
            srcpair = (
                self._chunk_src(mb) if self.spec_k > 1
                else self._dummy_srcpair
            )
            slots = [self._free.pop() for _ in range(take)]
            slot_ids = np.full((self.C,), self.S, np.int32)  # pad -> trash
            slot_ids[:take] = slots
            self._staged.append(
                (cache, enc_mask, *srcpair, jnp.asarray(slot_ids))
            )
            t_ins = time.monotonic()
            for s, r in zip(slots, reqs):
                r.t_slotted = t_ins
                self._slot_req[s] = r
                self._slot_toks[s] = []
                self._slot_lps[s] = []

    def _finish_slot(self, s: int):
        self._live[s] = False
        req = self._slot_req[s]
        toks = self._slot_toks[s]
        lps = self._slot_lps[s]
        # reconstruct the greedy-decode row shape: [bos] + emissions + pad
        # (token ids, or component triples for the phoneme families)
        if self._ncomp == 1:
            row = [self._bos] + toks
            row += [self._pad] * (self.max_answer_length - len(row))
        else:
            row = [[self._bos] * self._ncomp] + toks
            row += [[self._pad] * self._ncomp] * (
                self.max_answer_length - len(row)
            )
        try:
            answer = self.executor._decode_rows([row])[0]
        except Exception as e:
            self._record(req, "error", error=repr(e))
            req.future.set_exception(e)
            with self._stats_lock:
                self._failed += 1
        else:
            if self.confidence:
                # greedy_decode's with_scores semantics: exp(mean chosen
                # log-prob over emitted component ids, EOS included); same
                # response shape as the gathered engine's confidence mode
                # (each lps entry is already summed over the step's ncomp
                # components, so the mean runs over steps x components)
                score = sum(lps) / max(len(lps) * self._ncomp, 1)
                answer = {
                    "answer": answer,
                    "confidence": round(math.exp(score), 4),
                }
            self._record(req, "ok",
                         answer_chars=len(answer["answer"] if self.confidence
                                          else answer),
                         decode_tokens=len(toks))
            req.future.set_result(answer)
            if req.t_slotted is not None:
                dt = time.monotonic() - req.t_slotted
                self._service_ewma = (
                    dt if not self._service_ewma
                    else 0.25 * dt + 0.75 * self._service_ewma
                )
            with self._stats_lock:
                self._served += 1
                self._latencies_ms.append(
                    (time.monotonic() - req.t_submit) * 1e3
                )
                del self._latencies_ms[:-10000]
                if self._cache_size:
                    self._cache[(req.image_id, req.question)] = answer
                    while len(self._cache) > self._cache_size:
                        self._cache.pop(next(iter(self._cache)))
        self._slot_req[s] = None
        self._slot_toks[s] = []
        self._slot_lps[s] = []
        self._free.append(s)

    def _expire_slot(self, s: int) -> None:
        """Deadline passed MID-DECODE: resolve the slotted request with
        TimeoutError, free the slot, and queue its device deactivation for
        the next dispatch (the kill mask)."""
        req = self._slot_req[s]
        self._live[s] = False
        self._slot_req[s] = None
        self._slot_toks[s] = []
        self._slot_lps[s] = []
        self._free.append(s)
        self._kill_pending.add(s)
        self._record(req, "expired", in_flight=True)
        fail_future(
            req.future, TimeoutError("deadline exceeded mid-decode")
        )
        with self._stats_lock:
            self._expired += 1

    def _run(self):
        try:
            self._run_inner()
        except Exception as e:
            # a raising device dispatch (lost device, OOM, poisoned
            # buffers): no retry story exists on a dead backend — fail
            # everything in flight and flip unhealthy instead of silently
            # hanging every client with a dead worker thread
            self._fail_inflight(e)

    def _run_inner(self):
        running = True
        while True:
            if self._unhealthy is not None:
                return  # _fail_inflight already resolved everything
            busy = any(self._slot_req) or self._waiting or self._staged
            if not running and not busy:
                if self._reload_req is not None:  # fail a reload caught by stop
                    ev, err = self._reload_req
                    err.append(RuntimeError("engine stopped during reload"))
                    self._reload_req = None
                    ev.set()
                return
            # block only when fully idle; otherwise just drain what's there
            if running:
                running = self._drain_queue(block=not busy)
            # mid-decode deadline enforcement at the dispatch boundary:
            # expire BEFORE admission so a freed slot is immediately reusable
            now = time.monotonic()
            for s in range(self.S):
                req = self._slot_req[s]
                if (self._live[s] and req is not None and req.deadline
                        and req.deadline < now):
                    self._expire_slot(s)
            if self._reload_req is None:
                self._admit()
            elif not any(self._slot_req) and not self._staged:
                # drain barrier reached: no slot decodes under mixed weights
                self._finish_reload()
                self._admit()
            # else: admission paused; live slots keep draining below
            live = [s for s in range(self.S)
                    if self._live[s] and self._slot_req[s] is not None]
            if not live and not self._staged and not self._kill_pending:
                continue
            # one fused dispatch: scatter at most one staged chunk, then run
            # a horizon of decode steps; the next iteration's
            # featurize/prefill overlaps this decode via JAX async dispatch
            if self._staged:
                chunk_cache, chunk_mask, src, valid, slot_ids = (
                    self._staged.pop(0)
                )
                for s in np.asarray(slot_ids):
                    if s < self.S:
                        self._live[int(s)] = True
            else:
                chunk_cache, chunk_mask = self._dummy_chunk
                src, valid = self._dummy_srcpair
                slot_ids = self._trash_slots
            if self._kill_pending:
                kill = np.zeros((self.S + 1,), bool)
                kill[list(self._kill_pending)] = True
                self._kill_pending.clear()
                kill = jnp.asarray(kill)
            else:
                kill = self._no_kill
            with self._watchdog.guard("decode dispatch"):
                self._state, toks, neff, lps = self._unpack_advance(
                    self._advance(
                        self._params, self._state, self._full_bias,
                        chunk_cache, chunk_mask, src, valid, slot_ids, kill,
                    )
                )
            live = [s for s in range(self.S)
                    if self._live[s] and self._slot_req[s] is not None]
            with self._stats_lock:
                self._dispatches += 1
                self._slot_steps += len(live) * self.horizon
                self._total_steps += self.S * self.horizon
            with self._watchdog.guard("decode materialize"):
                toks_np = np.asarray(toks)  # blocks until the horizon completes
                lps_np = np.asarray(lps)
                neff_np = None if neff is None else np.asarray(neff)
            if self._unhealthy is not None:
                return  # stall fired while blocked; futures already failed
            spec_emitted = spec_steps = 0
            for step in range(self.horizon):
                for s in live:
                    req = self._slot_req[s]
                    if req is None or not self._live[s]:
                        continue
                    if neff_np is not None:
                        # speculative: 0..K accepted tokens this device step
                        spec_steps += 1
                        for j in range(int(neff_np[step, s])):
                            t = int(toks_np[step, s, j])
                            self._slot_toks[s].append(t)
                            self._slot_lps[s].append(float(lps_np[step, s, j]))
                            spec_emitted += 1
                            if t == self._eos or len(
                                self._slot_toks[s]
                            ) >= self.max_answer_length - 1:
                                self._finish_slot(s)
                                break
                        continue
                    if self._ncomp == 1:
                        t = int(toks_np[step, s])
                        stop = t == self._eos
                    else:
                        t = [int(c) for c in toks_np[step, s]]
                        stop = t[0] == self._eos  # onset EOS ends the row
                    self._slot_toks[s].append(t)
                    self._slot_lps[s].append(float(lps_np[step, s]))
                    if stop or len(self._slot_toks[s]) >= (
                        self.max_answer_length - 1
                    ):
                        self._finish_slot(s)
            if spec_steps:
                with self._stats_lock:
                    self._spec_tokens += spec_emitted
                    self._spec_steps += spec_steps
