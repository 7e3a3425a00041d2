"""Serving-side frozen-ViT encoding cache (``VIT_CACHE: true`` in serve mode).

The offline counterpart (`data/vit_cache.py`) precomputes encodings for a
whole dataset up front; serving cannot — the request stream is unknown and
feature stores can be far larger than the encoding budget. This is the online
form: a persistent ``image_id -> encoding`` LRU table owned by the engine.
Each gathered batch encodes only its *missing* images (deduped, in fixed-size
chunks so ONE compiled encoder executable serves every miss pattern), then
feeds ``vit_encodings`` to the model instead of ``pixel_values`` — the swap
the model families already accept through ``FusionModel._img_features``.

Why it pays in serving specifically: VQA traffic is many questions per image
(the reference's own eval data averages ~4 rows per image), and the reference
reruns its frozen ViT on every one (`/root/reference/core/model/LaTr.py:85-97`
recomputes `img_feat` per batch). Here a repeat image costs a table gather —
no ViT forward, and ~half the H2D bytes (a 197x768 encoding row vs a
3x224x224 f32 pixel tensor).

Validity: the encoder is dropout-free, so an entry is exact while the ViT
weights are unchanged. The table is therefore flushed on hot weight reload,
and the cache refuses to build when any serving LoRA adapter targets the ViT
(adapter switches would need per-adapter tables; base-only adapters — the
supported LaTr-family shape — leave the ViT subtree untouched).

Thread model: ``apply`` runs on the engine's single worker thread; ``flush``
and ``stats`` on HTTP/watcher threads. The lock protects only table/counter
STATE — the device encode of a cold batch runs outside it (so /stats and a
reload's flush never block for an encode), and inserts re-check a
``generation`` counter bumped by every flush: encodings computed under
pre-flush weights can never land in the post-flush table. The engine
re-checks the same counter at dispatch time to keep a whole batch's
encodings and params consistent.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from ..utils.logger import get_logger

log = get_logger(__name__)


class EncodingCache:
    def __init__(self, executor, chunk: int = 8, max_bytes: int = 4 << 30):
        import jax

        self.executor = executor
        self.chunk = int(chunk)
        self.max_bytes = int(max_bytes)
        model = executor.model
        self._encode = jax.jit(
            lambda p, pix: model.apply(
                {"params": p}, pix, method="encode_image"
            )
        )
        self._table: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self._hits = 0
        self._misses = 0
        self._lock = threading.Lock()
        self._generation = 0  # bumped by flush(); guards stale inserts

    # -- construction gate ------------------------------------------------------

    @classmethod
    def maybe_build(cls, executor, adapters=None) -> Optional["EncodingCache"]:
        """Build when ``VIT_CACHE`` is on and caching is valid for this
        executor, else None (with the reason logged). Mirrors the gating of
        ``BaseExecutor._maybe_attach_vit_cache`` for the serve mode."""
        config = getattr(executor, "config", None)
        if config is None or not config.get("VIT_CACHE"):
            return None
        if getattr(getattr(executor, "model_config", None), "vit", None) is None:
            log.warning(
                f"(!) VIT_CACHE ignored: {config.MODEL_CLASS} has no image "
                "encoder"
            )
            return None
        for name, spec in (adapters or {}).items():
            if "vit" in spec.get("lora", {}):
                log.warning(
                    f"(!) VIT_CACHE ignored: serving adapter {name!r} targets "
                    "the ViT (encodings would differ per adapter)"
                )
                return None
        chunk = int(config.get("VIT_CACHE_BATCH", 0) or 8)
        max_bytes = int(float(config.get("VIT_CACHE_MAX_GB", 4)) * 2**30)
        cache = cls(executor, chunk, max_bytes)
        log.info(
            f"# serving VIT_CACHE on: encode chunk {chunk}, "
            f"bound {max_bytes >> 20} MiB"
        )
        return cache

    # -- per-batch transform ------------------------------------------------------

    def apply(self, ds, image_ids: List[str]) -> None:
        """Swap ``ds``'s lazy ``pixel_values`` for eager ``vit_encodings``
        gathered from the table, encoding the batch's missing images first.
        ``image_ids`` aligns 1:1 with the dataset rows."""
        if "pixel_values" not in ds.lazy_fields:
            return  # family without pixels (SaL) — nothing to cache
        if len(ds) != len(image_ids):
            raise RuntimeError(
                f"featurization dropped rows: {len(ds)} != {len(image_ids)}"
            )
        ids = [str(i) for i in image_ids]
        fresh: dict = {}  # this call's own encodes (served even if a flush
        n_missing = None  # landed mid-encode; never inserted stale)
        while True:
            with self._lock:
                gen = self._generation
                need = {}
                for row, i in enumerate(ids):
                    if i not in self._table and i not in fresh and i not in need:
                        need[i] = row
                if n_missing is None:
                    n_missing = len(need)
                if not need:
                    out = []
                    for i in ids:
                        if i in self._table:
                            self._table.move_to_end(i)  # LRU touch
                            out.append(self._table[i])
                        else:  # flushed mid-encode: serve this call's copy
                            out.append(fresh[i])
                    self._hits += len(ids) - n_missing
                    self._misses += n_missing
                    while self._bytes > self.max_bytes and len(self._table) > 1:
                        _, old = self._table.popitem(last=False)
                        self._bytes -= old.nbytes
                    enc = np.stack(out)
                    break
            # device encode OUTSIDE the lock: stats()/flush() (HTTP and
            # reload threads) stay responsive during a cold-batch encode
            new = self._encode_missing(ds, need)
            with self._lock:
                if self._generation == gen:  # no flush since `need` was read
                    for i, e in new.items():
                        if i not in self._table:
                            self._table[i] = e
                            self._bytes += e.nbytes
                # else: computed under pre-flush weights — do NOT insert;
                # serve them to this batch only (the engine's dispatch-time
                # generation check re-featurizes it under the new weights)
            fresh.update(new)
        del ds.lazy_fields["pixel_values"]
        ds.arrays = dict(ds.arrays, vit_encodings=enc)

    def _encode_missing(self, ds, first_row: dict) -> dict:
        """Encode each missing image once, in fixed ``chunk``-row calls
        (short chunk padded by repeating its last row — one executable for
        every miss count). Returns {image_id: encoding}; the caller inserts
        under the lock."""
        rows = np.fromiter(first_row.values(), dtype=np.int64)
        pixels = ds.lazy_fields["pixel_values"](rows)
        params = self.executor._inference_params()
        encs = []
        for start in range(0, len(rows), self.chunk):
            pix = pixels[start : start + self.chunk]
            n_valid = len(pix)
            if n_valid < self.chunk:
                pix = np.concatenate(
                    [pix, np.repeat(pix[-1:], self.chunk - n_valid, axis=0)]
                )
            encs.append(np.asarray(self._encode(params, pix))[:n_valid])
        return dict(zip(first_row, np.concatenate(encs)))

    # -- lifecycle ------------------------------------------------------------

    @property
    def generation(self) -> int:
        """Bumped by every flush. The engine snapshots it before featurizing
        a batch and re-checks before dispatch: a mismatch means a reload
        landed in between and the batch must re-featurize, or it would decode
        old-weights encodings under new params."""
        with self._lock:
            return self._generation

    def flush(self) -> None:
        """Drop every entry (weights changed — encodings are stale) and bump
        the generation so an encode in flight on the worker thread can no
        longer insert its pre-flush results."""
        with self._lock:
            n = len(self._table)
            self._table.clear()
            self._bytes = 0
            self._generation += 1
        if n:
            log.info(f"# serving VIT_CACHE flushed ({n} entries)")

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._table),
                "bytes": self._bytes,
                "hits": self._hits,
                "misses": self._misses,
            }
