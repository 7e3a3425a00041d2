"""Dynamic-batching serving engine over an executor's decode path.

The reference has no serving story (its closest analog is ``predict`` mode:
`/root/reference/core/executor/base_executor.py:143-165`, a one-shot batch
job). This engine turns the same production decode path into an online
server the TPU-first way:

* **One compiled executable serves all traffic.** Requests are gathered into
  a FIXED serve batch shape (padding partial batches), so the jitted
  whole-sequence generate compiled at startup is reused for every request —
  no recompiles, no dynamic shapes.
* **Dynamic batching trades the measured latency/throughput curve.** A lone
  request waits at most ``max_wait_ms`` before decoding (B=1 ≈ 13 ms on
  1× v5e at LaTr-base, docs/DESIGN.md); under load the batch fills to
  ``batch_size`` and rides the throughput end of the curve (B=32 ≈ 77 ms
  for 32 answers).
* **Featurization rides the existing data layer.** Each batch of requests
  becomes a small QA frame joined against the preloaded OCR (and optional
  object) feature stores via the executor's own ``_make_dataset`` — the
  exact arrays the eval path produces, at ~3.5k rows/s host-side.

Works with any executor family (LaTr/PreSTU/SaL × stock/customized/phoneme):
the engine only uses ``executor._make_dataset`` and ``executor.infer``.
"""

from __future__ import annotations

import math
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import pandas as pd

from ..utils.logger import get_logger
from .watchdog import StallWatchdog, fail_future

log = get_logger(__name__)


class _Request:
    __slots__ = ("image_id", "question", "future", "t_submit", "deadline",
                 "adapter", "t_slotted")

    def __init__(self, image_id, question, deadline=None, adapter=None):
        self.image_id = image_id
        self.question = question
        self.future: Future = Future()
        self.t_submit = time.monotonic()
        self.deadline = deadline  # absolute monotonic time, or None
        self.adapter = adapter  # LoRA adapter name, or None = base
        self.t_slotted = None  # when device work started (EWMA input)


def featurize_requests(executor, ocr_df, obj_df, reqs: List[_Request]):
    """Requests -> the executor's own eval-path arrays (a small QA frame
    joined against the preloaded OCR/object stores via ``_make_dataset``)."""
    qa = pd.DataFrame(
        {
            "image_id": [r.image_id for r in reqs],
            "question": [r.question for r in reqs],
            # the data layer featurizes answers for teacher forcing;
            # serving has none — a dummy keeps the row schema intact
            "answer": [""] * len(reqs),
            "filename": [f"{r.image_id}.jpg" for r in reqs],
        }
    )
    qa["image_id"] = qa["image_id"].astype(ocr_df["image_id"].dtype)
    if obj_df is not None:
        return executor._make_dataset(qa, ocr_df, obj_df)
    return executor._make_dataset(qa, ocr_df)


class ServingEngine:
    """Batches concurrent answer requests through ``executor.infer``.

    Parameters
    ----------
    executor: a constructed executor (any mode) with weights in place —
        e.g. built by ``serve.py`` in eval mode with the best checkpoint
        loaded, or a train-mode executor in tests.
    ocr_df: adapted OCR feature frame (``textlayout_ocr_adapt``).
    obj_df: adapted object feature frame (SaL family only).
    batch_size: the fixed serve batch shape (compiled once).
    max_wait_ms: max time a lone request waits for batch-mates.
    max_answer_length: decode length cap (compiled into the generate fn).
    warmup: compile the executable at construction, not on first request.
    max_queue: >0 bounds pending requests; submit raises when full
        (backpressure instead of unbounded accumulation under overload).
        **-1 derives a sane bound automatically (4 x batch_size).** A bound
        below 2 x batch_size STARVES the batcher — the queue can never hold
        a full batch plus arrivals, so the engine decodes partial batches
        and goodput collapses far below capacity (measured: 22.7 req/s vs
        ~62 req/s capacity with batch 16 / max_queue 8) — a loud warning is
        logged. 0 = unbounded (benchmarks; not production).
    cache_size: >0 memoizes up to that many (image_id, question) -> answer
        pairs (LRU). Decode is deterministic and weights only change through
        :meth:`reload` (which clears the cache), so repeats are answered
        without touching the device.
    default_deadline_s: >0 gives every request a deadline that many
        seconds after submission. A request whose deadline passes while it
        waits in the queue is EXPIRED before featurization/decode (resolved
        with TimeoutError) instead of burning device time on an answer the
        client already gave up on — load shedding that keeps an overloaded
        server's useful throughput flat. Per-request ``deadline_s`` on
        :meth:`submit` overrides.
    adapters: {name: {"lora": adapter_tree, "scale": float}} — serve
        several LoRA finetunes off ONE base model (multi-adapter serving).
        A request naming an adapter decodes with ``base + scale * A@B``
        merged on the fly; requests are grouped by adapter within each
        gathered batch, and a switch costs one jitted param-tree
        multiply-add (~2x params of HBM traffic, on the order of one batch
        decode) — NOT a second copy of the model in memory. Adapter trees
        are validated against the base at construction (layout/family
        mismatches fail fast instead of serving a half-applied model).
    buckets: ascending decode-batch shapes (e.g. ``[1, 4]``) compiled at
        warmup alongside ``batch_size``; each gathered batch decodes at the
        smallest bucket that fits, so a lone request under light load rides
        the latency-optimal small executable instead of padding to the full
        throughput shape. Bucket sizes are rounded up to the mesh's data
        axis. Default: single shape (``[batch_size]``).
    confidence: resolve requests to ``{"answer", "confidence"}`` dicts
        instead of bare answer strings. Confidence is the geometric-mean
        emitted-token probability (exp of the decode loop's mean log-prob —
        see ``BaseExecutor.infer(return_scores=True)``), accumulated inside
        the same compiled decode; production callers threshold on it to
        route low-confidence answers to review.
    access_log: callable receiving one dict per resolved request — a
        structured access log (``serve.py --access-log FILE`` writes them
        as JSON lines). Every admission outcome is recorded: ``ok`` (with
        the decode bucket and answer length), ``cached``, ``expired``, and
        ``error``; each record carries the submit→resolution latency. The
        question TEXT is never logged (only its length) so the log is safe
        to ship to ordinary log pipelines. A sink that raises is disabled
        after one loud warning — logging can never take serving down.
    """

    def __init__(
        self,
        executor,
        ocr_df: pd.DataFrame,
        obj_df: Optional[pd.DataFrame] = None,
        batch_size: int = 8,
        max_wait_ms: float = 5.0,
        max_answer_length: int = 20,
        warmup: bool = True,
        max_queue: int = 0,
        cache_size: int = 0,
        confidence: bool = False,
        default_deadline_s: float = 0.0,
        adapters: Optional[dict] = None,
        buckets: Optional[list] = None,
        access_log=None,
        stall_timeout_s: float = 300.0,
    ):
        self.executor = executor
        self.ocr_df = ocr_df
        self.obj_df = obj_df
        self.batch_size = int(batch_size)
        self.buckets = self._resolve_buckets(buckets)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_answer_length = int(max_answer_length)
        self.confidence = bool(confidence)
        self.default_deadline_s = float(default_deadline_s)
        self._id_dtype = ocr_df["image_id"].dtype
        self._known_ids = set(ocr_df["image_id"])
        if obj_df is not None:
            # SaL family: featurization inner-joins BOTH stores — admit only
            # images present in each, or one bad request would fail its
            # whole batch at the dropped-rows check
            self._known_ids &= set(obj_df["image_id"])
        if not self._known_ids:
            raise ValueError(
                "feature store is empty (no image ids" +
                (" present in both OCR and object stores)" if obj_df is not None
                 else " in the OCR store)")
            )
        # max_queue > 0 bounds admission: submit raises instead of letting an
        # overloaded server accumulate unbounded work (stop()'s sentinel uses
        # a blocking put, so the bound never deadlocks shutdown)
        if max_queue < 0:
            # auto: deep enough to hold the in-assembly batch plus a full
            # next batch of arrivals at any admission instant, so rejection
            # starts only past real capacity, not below it
            max_queue = 4 * self.batch_size
        elif 0 < max_queue < 2 * self.batch_size:
            log.warning(
                f"(!) max_queue={max_queue} < 2*batch_size="
                f"{2 * self.batch_size} STARVES the batcher: the queue can "
                "never hold a full batch plus arrivals, so decodes run "
                "partial and goodput collapses below capacity. Use "
                f">= {2 * self.batch_size} (or -1 to auto-derive "
                f"{4 * self.batch_size})."
            )
        self.max_queue = max_queue
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue(maxsize=max_queue)
        self._stopped = False
        self._unhealthy: Optional[str] = None
        # device-stall watchdog: a dispatch or materialization blocking past
        # stall_timeout_s fails every in-flight future, flips /healthz to
        # 503 and keeps stop() returning (a dead TPU tunnel otherwise hangs
        # np.asarray forever). Deadlines are additionally enforced at the
        # batch boundary: a request whose deadline passed while its batch
        # decoded resolves TimeoutError, not a late answer.
        self._watchdog = StallWatchdog(stall_timeout_s, self._on_stall)
        self._inflight_reqs: set = set()  # claimed by the dispatcher,
        self._inflight_lock = threading.Lock()  # unresolved by the resolver
        self._lock = threading.Lock()
        self._stats_lock = threading.Lock()
        # serializes every weight swap: the worker's _activate (adapter
        # merges) vs reload() on HTTP/watcher threads, and reload vs reload.
        # Without it a merge landing between reload's restore and its
        # _base_params capture would make the OLD base + adapter the new
        # "base" — permanently poisoned weights.
        self._swap_lock = threading.Lock()
        self._served = 0
        self._failed = 0
        self._service_ewma = 0.0  # claim->resolve seconds, viability gate
        self._batches = 0
        self._cache_hits = 0
        self._reloads = 0
        self._expired = 0
        self._latencies_ms: list = []
        self._cache_size = int(cache_size)
        self._cache: "dict" = {}  # (image_id, question[, adapter]) -> answer
        self._bucket_batches: dict = {}  # decode-batch shape -> count
        self._adapters = dict(adapters or {})
        self._active_adapter = None
        self._adapter_switches = 0
        self._access_log = access_log
        if self._adapters:
            import jax

            from ..train import lora as lora_mod

            # deferred-init executors (serve --ckpt none) must materialize
            # before the base tree is captured for merges (stub executors in
            # tests have no such method)
            getattr(self.executor, "_ensure_params", lambda: None)()
            self._base_params = self.executor.state.params
            for name, spec in self._adapters.items():
                bad = lora_mod.unmatched_adapter_paths(
                    self._base_params, spec["lora"]
                )
                if bad:
                    raise ValueError(
                        f"adapter {name!r} does not match the served base "
                        f"model: {len(bad)} unmatched kernel(s), e.g. "
                        f"{bad[:3]} — wrong family or SCAN_LAYERS layout?"
                    )
            # one jitted merge reused for every switch (retraces only if
            # adapter tree structures differ)
            self._merge = jax.jit(lora_mod.merge_lora, static_argnums=(2,))
        from .encoding_cache import EncodingCache

        # frozen-ViT encoding table (VIT_CACHE in serve mode): built BEFORE
        # warmup so the warmed executables take the vit_encodings input —
        # with the cache on, every batch rides that one program shape
        self._enc_cache = EncodingCache.maybe_build(executor, self._adapters)
        if warmup:
            # pay the XLA compile before accepting traffic, not on the first
            # client request (compiles the fixed-shape generate executable —
            # one per latency bucket)
            ds = self._featurize([self._dummy_request()])
            for bucket in self.buckets:
                self.executor.infer(
                    ds, bucket, self.max_answer_length,
                    return_scores=self.confidence,
                )
        # two-stage pipeline: the DISPATCHER gathers/featurizes/dispatches
        # (JAX async dispatch returns immediately) and the RESOLVER
        # materializes answers — so featurize + H2D + prefill of batch i+1
        # overlap the device decode of batch i instead of serializing behind
        # it. The bounded handoff queue (depth 2) is the backpressure.
        self._inflight: "queue.Queue" = queue.Queue(maxsize=2)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._resolver.start()

    def _dummy_request(self) -> _Request:
        """A featurizable placeholder request (warmup / AOT packing)."""
        return _Request(next(iter(self._known_ids)), "")

    def _record(self, req: _Request, status: str, **extra) -> None:
        """Emit one access-log record (no-op without a sink). The sink runs
        on the caller's thread (worker, or submit for cache hits) — a sink
        that raises is disabled after one warning, never crashes serving."""
        if self._access_log is None:
            return
        image_id = req.image_id
        rec = {
            "ts": round(time.time(), 3),
            # numpy scalar ids (the store's key dtype) -> plain JSON numbers
            "image_id": image_id.item() if hasattr(image_id, "item") else image_id,
            "question_chars": len(req.question),  # length only, never the text
            "adapter": req.adapter,
            "status": status,
            "latency_ms": round((time.monotonic() - req.t_submit) * 1e3, 3),
            **extra,
        }
        try:
            self._access_log(rec)
        except Exception as e:
            log.warning(
                f"(!) access-log sink raised {e!r} — access logging disabled"
            )
            self._access_log = None

    def _resolve_buckets(self, buckets) -> list:
        """Ascending decode-batch shapes ending at ``batch_size``. None (the
        default) keeps the single-shape engine. Each bucket is rounded UP to
        a multiple of the mesh's data axis so a small batch never trips
        ``shard_batch``'s replicated fallback, then clipped to batch_size
        and deduped."""
        if not buckets:
            return [self.batch_size]
        dp = int(self.executor.mesh.shape.get("data", 1))
        out = set()
        for b in buckets:
            b = int(b)
            if b <= 0:
                raise ValueError(f"bucket sizes must be positive, got {b}")
            b = min(self.batch_size, -(-b // dp) * dp)
            out.add(b)
        out.add(self.batch_size)
        return sorted(out)

    # -- client surface -------------------------------------------------------

    def submit(
        self, image_id, question: str, deadline_s: float = None,
        adapter: str = None,
    ) -> Future:
        """Enqueue a request; resolves to the answer string (or the
        ``{"answer", "confidence"}`` dict in confidence mode).
        ``deadline_s`` (or the engine's ``default_deadline_s``) expires the
        request with TimeoutError if it is still queued that many seconds
        from now. ``adapter`` decodes with that LoRA adapter merged onto
        the base (must be a key of the engine's ``adapters``)."""
        if adapter is not None and adapter not in self._adapters:
            raise KeyError(
                f"unknown adapter {adapter!r} (serving "
                f"{sorted(self._adapters) or 'base only'})"
            )
        with self._lock:  # uniform admission: a stopped engine rejects
            if self._unhealthy is not None:  # everything, cache included
                raise RuntimeError(f"engine unhealthy: {self._unhealthy}")
            if self._stopped:
                raise RuntimeError("engine stopped")
        if self._id_dtype.kind in "if":
            try:
                # coerce to the store's key dtype (JSON clients send "3" or 3
                # for a store keyed by float 3.0) — but only when the value
                # survives the round trip (int64(3.7) -> 3 would silently
                # answer for the wrong image)
                coerced = self._id_dtype.type(image_id)
                if float(coerced) == float(image_id):
                    image_id = coerced
            except (TypeError, ValueError):
                pass  # leave as-is; membership check below rejects it
        if image_id not in self._known_ids:
            stores = "OCR store" if self.obj_df is None else "OCR+object stores"
            raise KeyError(f"unknown image_id {image_id!r} (not in {stores})")
        if self._cache_size:
            key = (image_id, question, adapter)
            hit = object()  # sentinel: None is not a valid cached answer
            answer = hit
            with self._stats_lock:
                if key in self._cache:
                    answer = self._cache.pop(key)
                    self._cache[key] = answer  # move-to-end: LRU
                    self._cache_hits += 1
            if answer is not hit:
                self._record(
                    _Request(image_id, question, adapter=adapter), "cached"
                )
                fut: Future = Future()
                fut.set_result(answer)
                return fut
        if deadline_s is None and self.default_deadline_s > 0:
            deadline_s = self.default_deadline_s
        deadline = time.monotonic() + deadline_s if deadline_s else None
        req = _Request(image_id, question, deadline, adapter)
        with self._lock:  # pairs with stop(): no enqueue after the sentinel
            if self._unhealthy is not None:
                raise RuntimeError(f"engine unhealthy: {self._unhealthy}")
            if self._stopped:
                raise RuntimeError("engine stopped")
            try:
                self._queue.put_nowait(req)
            except queue.Full:
                raise RuntimeError(
                    f"serving queue full ({self._queue.maxsize} pending)"
                ) from None
        return req.future

    def answer(
        self, image_id, question: str, timeout: Optional[float] = None,
        deadline_s: float = None, adapter: str = None,
    ) -> str:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(
            image_id, question, deadline_s=deadline_s, adapter=adapter
        ).result(timeout=timeout)

    def stats(self) -> dict:
        """Served/failed counts, batch count, queue depth, and request-latency
        percentiles (submit -> resolution, ms) over the last 10k requests."""
        with self._stats_lock:
            lats = sorted(self._latencies_ms)
            pct = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))] if lats else None
            return {
                "served": self._served,
                "failed": self._failed,
                "unhealthy": self._unhealthy,
                "batches": self._batches,
                "cache_hits": self._cache_hits,
                "reloads": self._reloads,
                "expired": self._expired,
                "service_ewma_s": round(self._service_ewma, 3),
                "adapter_switches": self._adapter_switches,
                "bucket_batches": {
                    str(k): v for k, v in sorted(self._bucket_batches.items())
                },
                "queue_depth": self._queue.qsize(),
                "p50_ms": pct(0.50),
                "p95_ms": pct(0.95),
                **(
                    {"vit_cache": self._enc_cache.stats()}
                    if self._enc_cache is not None
                    else {}
                ),
            }

    def prometheus_metrics(self) -> str:
        """:meth:`stats` rendered in the Prometheus text exposition format
        (served at ``GET /metrics`` by ``serve.py --http``) so a standard
        scraper monitors the server with zero glue code."""
        s = self.stats()
        counters = {
            "served": "requests answered",
            "failed": "requests resolved with an error",
            "batches": "decode batches dispatched",
            "cache_hits": "requests answered from the LRU cache",
            "reloads": "hot weight reloads",
            "expired": "requests shed after their deadline passed in queue",
            "adapter_switches": "LoRA adapter merges onto the base weights",
        }
        lines = []
        for name, help_text in counters.items():
            lines += [
                f"# HELP phonovqa_{name}_total {help_text}",
                f"# TYPE phonovqa_{name}_total counter",
                f"phonovqa_{name}_total {s[name]}",
            ]
        if s["bucket_batches"]:
            lines += [
                "# HELP phonovqa_bucket_batches_total decoded batches per "
                "compiled batch shape",
                "# TYPE phonovqa_bucket_batches_total counter",
            ]
            lines += [
                f'phonovqa_bucket_batches_total{{size="{k}"}} {v}'
                for k, v in s["bucket_batches"].items()
            ]
        lines += [
            "# HELP phonovqa_queue_depth requests waiting for a batch slot",
            "# TYPE phonovqa_queue_depth gauge",
            f"phonovqa_queue_depth {s['queue_depth']}",
            "# HELP phonovqa_request_latency_ms submit-to-resolution latency",
            "# TYPE phonovqa_request_latency_ms summary",
        ]
        for q, key in (("0.5", "p50_ms"), ("0.95", "p95_ms")):
            if s[key] is not None:
                lines.append(
                    f'phonovqa_request_latency_ms{{quantile="{q}"}} {s[key]:.3f}'
                )
        return "\n".join(lines) + "\n"

    def reload(self, loadtype: str = "best") -> dict:
        """Hot-swap the serving weights from the checkpoint directory with NO
        downtime: requests keep flowing while the new checkpoint restores;
        the in-flight batch finishes on the old weights (``executor.infer``
        snapshots the params once per call) and the next batch decodes with
        the new ones — the swap is a single atomic attribute assignment.
        Orbax finalizes saves by atomic rename, so a concurrent trainer can
        never expose a half-written tree. The answer cache is cleared (its
        entries are stale under new weights)."""
        with self._lock:
            if self._stopped:
                raise RuntimeError("engine stopped")
        t0 = time.monotonic()
        # _swap_lock: no adapter merge (_activate, worker thread) or
        # concurrent reload (watcher + /reload) may interleave between the
        # restore and the _base_params capture — the capture must see exactly
        # the restored tree, never a merged one
        with self._swap_lock:
            self.executor._load_trained_checkpoint(loadtype)
            # the reloaded weights are the new BASE; adapters re-merge onto
            # it lazily at the next adapter-routed batch
            if self._adapters:
                self._base_params = self.executor.state.params
                self._active_adapter = None
            if self._enc_cache is not None:
                # ViT weights may have changed with the base: drop the
                # encoding table. flush() bumps the cache generation, which
                # (a) blocks any in-flight encode from inserting pre-flush
                # results and (b) makes the dispatcher re-featurize a batch
                # caught between featurize and dispatch (see _run_inner) —
                # no batch decodes old-weights encodings under new params.
                self._enc_cache.flush()
        with self._stats_lock:
            self._cache.clear()
            self._reloads += 1
        ms = (time.monotonic() - t0) * 1e3
        log.info(f"## hot-reloaded {loadtype}_ckp in {ms:.0f} ms")
        return {"reloaded": loadtype, "ms": round(ms, 1)}

    @property
    def unhealthy_reason(self) -> Optional[str]:
        """Non-None once the stall watchdog (or a fatal device error)
        declared the engine dead — ``/healthz`` turns 503."""
        return self._unhealthy

    def stop(self):
        """Drain outstanding requests, then stop both pipeline threads.
        ALWAYS returns: threads stuck on a dead device cannot be joined —
        once the watchdog declares the stall they are abandoned (daemons)."""
        with self._lock:
            already = self._stopped
            self._stopped = True
        if already and not (self._worker.is_alive() or self._resolver.is_alive()):
            return
        while self._worker.is_alive() or self._resolver.is_alive():
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                pass  # worker drains it (or is stuck — watchdog decides)
            self._worker.join(timeout=0.5)
            if not self._worker.is_alive():
                self._resolver.join(timeout=0.5)
            if self._unhealthy:
                self._worker.join(timeout=1.0)
                self._resolver.join(timeout=1.0)
                if self._worker.is_alive() or self._resolver.is_alive():
                    log.warning(
                        "(!) stop(): abandoning pipeline thread(s) stuck on "
                        "a dead device (daemon threads)"
                    )
                break
        self._watchdog.close()

    def _on_stall(self, label: str, waited: float) -> None:
        self._fail_inflight(RuntimeError(
            f"device stall: {label} blocked {waited:.0f}s (dead TPU tunnel?)"
        ))

    def _fail_inflight(self, exc: Exception) -> None:
        """Mark unhealthy and fail every claimed-but-unresolved and queued
        future with ``exc``. Idempotent; runs on the watchdog monitor
        thread (pipeline threads stuck) or a pipeline thread (fatal error)."""
        with self._lock:
            if self._unhealthy is not None:
                return
            self._unhealthy = str(exc)
            self._stopped = True
        n = 0
        with self._inflight_lock:
            inflight = list(self._inflight_reqs)
            self._inflight_reqs.clear()
        for r in inflight:
            n += fail_future(r.future, exc)
        while True:  # queued but never claimed by the dispatcher
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                n += fail_future(item.future, exc)
        with self._stats_lock:
            self._failed += n
        log.error(
            f"(!!) engine unhealthy ({exc}) — failed {n} in-flight "
            "request(s); submits now reject"
        )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- worker ---------------------------------------------------------------

    def _activate(self, adapter) -> None:
        """Swap the executor onto ``adapter`` (None = base): one jitted
        param-tree multiply-add per switch, skipped when the adapter is
        already active. Runs on the worker thread; _swap_lock orders it
        against reload() on HTTP/watcher threads (the _active_adapter check
        itself must be inside the lock — reload resets it to None)."""
        if not self._adapters:
            return
        with self._swap_lock:
            if adapter == self._active_adapter:
                return
            if adapter is None:
                params = self._base_params
            else:
                spec = self._adapters[adapter]
                params = self._merge(
                    self._base_params, spec["lora"], float(spec["scale"])
                )
            self.executor.state = self.executor.state.replace(params=params)
            self.executor._bf16_params_cache = None
            self._active_adapter = adapter
        with self._stats_lock:
            self._adapter_switches += 1


    def _collect(self) -> List[_Request]:
        item = self._queue.get()
        if item is None:
            return []
        batch = [item]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-signal shutdown after this batch
                break
            batch.append(nxt)
        return batch

    def _featurize(self, reqs: List[_Request]):
        qa = pd.DataFrame(
            {
                "image_id": [r.image_id for r in reqs],
                "question": [r.question for r in reqs],
                # the data layer featurizes answers for teacher forcing;
                # serving has none — a dummy keeps the row schema intact
                "answer": [""] * len(reqs),
                "filename": [f"{r.image_id}.jpg" for r in reqs],
            }
        )
        qa["image_id"] = qa["image_id"].astype(self.ocr_df["image_id"].dtype)
        if self.obj_df is not None:
            ds = self.executor._make_dataset(qa, self.ocr_df, self.obj_df)
        else:
            ds = self.executor._make_dataset(qa, self.ocr_df)
        if self._enc_cache is not None:
            self._enc_cache.apply(ds, [r.image_id for r in reqs])
        return ds

    def _run(self):
        try:
            self._run_inner()
        except Exception as e:  # fatal dispatcher error (lost device, ...)
            self._fail_inflight(e)
            self._inflight.put(None)  # release the resolver

    def _run_inner(self):
        """Dispatcher: gather -> featurize -> DISPATCH (async) -> hand off.
        Materialization happens on the resolver thread, so this loop is back
        to assembling the next batch while the device decodes the current
        one."""
        while True:
            reqs = self._collect()
            if not reqs or self._unhealthy is not None:
                self._inflight.put(None)  # drain signal for the resolver
                return
            # claim the futures: a future cancelled while queued is dropped
            # here, and a RUNNING future can no longer be cancelled — so the
            # resolutions below cannot raise InvalidStateError and kill the
            # worker thread
            reqs = [r for r in reqs if r.future.set_running_or_notify_cancel()]
            with self._inflight_lock:  # visible to the stall handler
                self._inflight_reqs.update(reqs)
            # shed non-viable requests BEFORE featurization/decode: device
            # time only goes to answers somebody is still waiting for. A
            # request whose REMAINING deadline is under the measured service
            # time (EWMA of claim->resolve) would only expire mid-decode
            # after burning a batch seat — shed it now instead (measured:
            # without this, sustained 2x overload with a 3 s deadline
            # collapsed goodput because every slotted request expired
            # mid-decode; with shed-before-slot goodput holds near capacity)
            now = time.monotonic()
            min_left = self._service_ewma
            viable = lambda r: not r.deadline or r.deadline - now >= min_left
            expired = [r for r in reqs if not viable(r)]
            reqs = [r for r in reqs if viable(r)]
            for r in expired:  # record BEFORE resolving: a client observing
                self._record(r, "expired")  # the resolution sees a complete log
                fail_future(r.future, TimeoutError(
                    "deadline exceeded while queued" if r.deadline < now
                    else f"deadline cannot be met: {r.deadline - now:.2f}s "
                         f"left < {min_left:.2f}s estimated service time"
                ))
            for r in reqs:
                r.t_slotted = now
            if expired:
                with self._inflight_lock:
                    self._inflight_reqs.difference_update(expired)
                with self._stats_lock:
                    self._expired += len(expired)
            if not reqs:
                continue
            # multi-adapter: decode per adapter group (FIFO order preserved
            # within each group; one merge per switch, not per request).
            # In-flight batches keep the params their dispatch captured, so
            # the swap cannot corrupt them.
            groups = [reqs]
            if self._adapters:
                by_adapter: dict = {}
                for r in reqs:
                    by_adapter.setdefault(r.adapter, []).append(r)
                groups = list(by_adapter.values())
            work = []
            for group in groups:
                try:
                    self._activate(group[0].adapter)
                    enc_gen = (
                        self._enc_cache.generation
                        if self._enc_cache is not None else None
                    )
                    ds = self._featurize(group)
                    # reload race: a hot reload landing between featurize and
                    # dispatch swaps params AND flushes the encoding table —
                    # this batch would decode old-weights encodings under new
                    # params. Re-featurize until the generation is stable
                    # (the residual window — a reload between this check and
                    # infer_async's param snapshot — is a few instructions
                    # and costs at most one batch of slightly-stale
                    # encodings, never corrupted output shapes).
                    while (
                        self._enc_cache is not None
                        and self._enc_cache.generation != enc_gen
                    ):
                        enc_gen = self._enc_cache.generation
                        ds = self._featurize(group)
                    if len(ds) != len(group):
                        raise RuntimeError(
                            f"featurization dropped rows: {len(ds)} != {len(group)}"
                        )
                    # smallest warmed bucket that fits: a lone request rides
                    # the latency-optimal small executable instead of padding
                    # to the full throughput shape
                    bucket = next(
                        b for b in self.buckets if b >= len(group)
                    )
                    infer_async = getattr(self.executor, "infer_async", None)
                    if infer_async is not None:
                        # async dispatch still performs the H2D transfer —
                        # the call that blocks on a dead tunnel
                        with self._watchdog.guard("decode dispatch"):
                            resolve = infer_async(
                                ds, bucket, self.max_answer_length,
                                return_scores=self.confidence,
                            )
                    else:  # stub executors (tests) implement only infer:
                        # degrade to dispatch-time materialization
                        answers = self.executor.infer(
                            ds, bucket, self.max_answer_length,
                            return_scores=self.confidence,
                        )
                        resolve = lambda answers=answers: answers
                    work.append((group, bucket, resolve, None))
                except Exception as e:  # resolver reports it per request
                    work.append((group, None, None, e))
            # bounded handoff (depth 2): blocks when the resolver is behind
            self._inflight.put((reqs, work))

    def _resolve_loop(self):
        try:
            self._resolve_loop_inner()
        except Exception as e:  # fatal resolver error
            self._fail_inflight(e)

    def _resolve_loop_inner(self):
        """Resolver: materialize dispatched answers and complete futures."""
        while True:
            item = self._inflight.get()
            if item is None:
                return
            reqs, work = item
            answers_by_req: dict = {}
            bucket_by_req: dict = {}
            n_ok_groups = 0
            buckets_used: list = []
            for group, bucket, resolve, exc in work:
                answers = None
                if exc is None:
                    try:
                        # the materialization that hangs on a dead tunnel
                        with self._watchdog.guard("decode materialize"):
                            answers = resolve()
                        if self.confidence:
                            answers = [
                                {"answer": a,
                                 "confidence": round(math.exp(s), 4)}
                                for a, s in zip(*answers)
                            ]
                    except Exception as e:
                        exc = e
                if self._unhealthy is not None:
                    return  # stall fired mid-wait; futures already failed
                if exc is not None:  # resolve this group with the error
                    log.warning(f"serving batch of {len(group)} failed: {exc!r}")
                    for r in group:
                        self._record(r, "error", error=repr(exc))
                        fail_future(r.future, exc)
                    with self._inflight_lock:
                        self._inflight_reqs.difference_update(group)
                    with self._stats_lock:
                        self._failed += len(group)
                        self._batches += 1
                    continue
                n_ok_groups += 1
                buckets_used.append(bucket)
                for r, a in zip(group, answers):
                    answers_by_req[r] = a
                    bucket_by_req[r] = bucket
            reqs = [r for r in reqs if r in answers_by_req]
            if not reqs:
                continue
            now = time.monotonic()
            # batch-boundary deadline enforcement: a deadline that passed
            # while the batch decoded resolves TimeoutError — the client
            # stopped waiting; a late answer would be a lie
            late = [r for r in reqs if r.deadline and r.deadline < now]
            for r in late:
                self._record(r, "expired", in_flight=True)
                fail_future(
                    r.future, TimeoutError("deadline exceeded mid-decode")
                )
            reqs = [r for r in reqs if not (r.deadline and r.deadline < now)]
            answers = [answers_by_req[r] for r in reqs]
            for r, a in zip(reqs, answers):
                text = a["answer"] if isinstance(a, dict) else a
                self._record(
                    r, "ok", bucket=bucket_by_req[r], answer_chars=len(text)
                )
                try:
                    r.future.set_result(a)
                except Exception:  # lost a race with the stall handler
                    pass
            with self._inflight_lock:
                self._inflight_reqs.difference_update(reqs)
                self._inflight_reqs.difference_update(late)
            for r in reqs:
                if r.t_slotted is not None:
                    dt = now - r.t_slotted
                    self._service_ewma = (
                        dt if not self._service_ewma
                        else 0.25 * dt + 0.75 * self._service_ewma
                    )
            with self._stats_lock:
                self._served += len(reqs)
                self._expired += len(late)
                self._batches += n_ok_groups
                for b in buckets_used:
                    self._bucket_batches[b] = self._bucket_batches.get(b, 0) + 1
                self._latencies_ms.extend(
                    (now - r.t_submit) * 1e3 for r in reqs
                )
                del self._latencies_ms[:-10000]
                if self._cache_size:
                    # late answers are still valid model outputs — cache them
                    for r in reqs + late:
                        self._cache[
                            (r.image_id, r.question, r.adapter)
                        ] = answers_by_req[r]
                    while len(self._cache) > self._cache_size:
                        self._cache.pop(next(iter(self._cache)))
