"""AOT executable store: zero-compile serving restarts.

The serve executable is the product's cold-start cost: ~1.5 min of XLA
compile at base scale before the first answer (docs/DESIGN.md "Compilation
model"). The persistent compilation cache (`serve.py`) already skips the
*compile* on a warm filesystem, but every restart still pays trace + lower +
cache lookup per bucket shape. This module removes the whole pipeline from
the restart path: the *compiled executables themselves* are serialized to
disk (`jax.experimental.serialize_executable`) next to a manifest, and a
restarting server `load()`s them straight into the executor's generate-fn
table — no trace, no lower, no compile, no cache probe.

The reference has no serving story at all (its closest analog re-runs
`model(...)` eagerly per batch: `/root/reference/core/executor/
base_executor.py:143-165`); this is the TPU deployment step beyond it: a
container image baked with `serve.py --prime --aot DIR` starts answering at
process-start speed.

Safety model: an XLA executable is specialized to exact arg shapes/dtypes
and to the devices it was compiled for. The manifest pins jax/jaxlib
versions, platform, device kind and device count, and every entry records
its flattened (params, batch) aval signature. `load()` refuses a manifest
that doesn't match the running process; a loaded entry additionally
re-verifies its aval signature on first call and falls back to the normal
jit path (with one loud log line) on any mismatch — a stale store degrades
to a plain warm start, never to a crash or a wrong answer.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Optional, Tuple

import jax

from ..utils.logger import get_logger

log = get_logger(__name__)

_MANIFEST = "manifest.json"
_FORMAT = 1


def _env_fingerprint() -> dict:
    """The compatibility surface an XLA executable is specialized to."""
    import jaxlib

    devs = jax.devices()
    return {
        "format": _FORMAT,
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
        "process_count": jax.process_count(),
    }


def _aval_signature(tree) -> List[Tuple[str, str]]:
    """Flattened (shape, dtype) signature of an arg tree — the part of the
    compiled calling convention a restart could silently violate (different
    checkpoint scale, changed config dims, different bucket padding)."""
    return [
        (str(tuple(getattr(leaf, "shape", ()))), str(getattr(leaf, "dtype", "?")))
        for leaf in jax.tree.leaves(tree)
    ]


def _entry_filename(batch_size: int, max_length: int, with_scores: bool) -> str:
    return f"gen_b{batch_size}_len{max_length}_scores{int(with_scores)}.xla"


class AotGenerateDispatch:
    """Drop-in for a jitted generate fn in ``executor._generate_fns``.

    Routes each call to the deserialized executable for its batch shape;
    any batch size without a loaded (and signature-verified) executable
    falls back to a lazily-built jit fn — identical behavior, just paying
    the compile the AOT path avoids."""

    def __init__(self, executor, max_length: int, with_scores: bool):
        self.executor = executor
        self.max_length = max_length
        self.with_scores = with_scores
        # batch_size -> [callable, expected signature, verified?]
        self.loaded: dict = {}
        self._fallback = None

    def fallback(self):
        if self._fallback is None:
            self._fallback = self.executor._build_generate_fn(
                self.max_length, self.with_scores
            )
        return self._fallback

    def __call__(self, params, batch):
        b = int(jax.tree.leaves(batch)[0].shape[0])
        ent = self.loaded.get(b)
        if ent is None:
            return self.fallback()(params, batch)
        fn, sig, verified = ent
        if not verified:
            actual = _aval_signature((params, batch))
            if actual != sig:
                log.warning(
                    f"(!) AOT executable for batch={b} len={self.max_length} "
                    f"does not match the live arg shapes/dtypes (stale store?)"
                    f" — falling back to jit compile for this shape"
                )
                del self.loaded[b]
                return self.fallback()(params, batch)
            ent[2] = True
        try:
            return fn(params, batch)
        except TypeError as e:  # belt-and-braces: XLA's own arg check
            log.warning(
                f"(!) AOT executable rejected its args ({e}) — "
                f"falling back to jit compile for batch={b}"
            )
            del self.loaded[b]
            return self.fallback()(params, batch)


def _example_args(executor, dataset, batch_size: int):
    """(params, batch) exactly as ``BaseExecutor.infer`` passes them."""
    from ..data.loader import batch_iterator

    params = executor._inference_params()
    batch, _ = next(iter(batch_iterator(dataset, batch_size, pad_final=True)))
    return params, executor._shard(executor._model_batch(batch))


def pack(engine, path: str) -> List[dict]:
    """Compile + serialize the engine's serve executables (one per latency
    bucket, at the engine's answer length and confidence mode) into ``path``.

    Returns the manifest entries written. Runs after engine warmup, so each
    ``lower().compile()`` re-hits the in-process/persistent compile cache
    rather than paying a fresh compile. Every entry is verified by an
    actual deserialize+execute round trip before it is trusted; an entry
    that fails (a persistent-cache-loaded executable does not survive
    re-serialization on XLA:CPU) is transparently recompiled cache-free."""
    executor = engine.executor
    ds = engine._featurize([engine._dummy_request()])
    os.makedirs(path, exist_ok=True)
    entries = []
    for bucket in engine.buckets:
        entry = _pack_one(
            executor, ds, bucket, engine.max_answer_length,
            engine.confidence, path,
        )
        entries.append(entry)
    manifest = {**_env_fingerprint(), "entries": entries}
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic: no torn manifest
    total = sum(e["bytes"] for e in entries)
    log.info(
        f"## AOT store packed: {len(entries)} executable(s), "
        f"{total / 1e6:.1f} MB -> {path}"
    )
    return entries


def _compile_without_persistent_cache(fn, args):
    """Compile ``fn`` for ``args`` with the persistent compilation cache
    genuinely OFF, returning a freshly-built executable.

    Setting ``jax_compilation_cache_dir=None`` is NOT enough once the cache
    has been used in-process: ``compilation_cache.is_cache_used`` memoizes
    its verdict (``_cache_checked``) and ``_get_cache`` keeps returning the
    already-initialized cache object. ``reset_cache()`` clears both, and the
    enable flag makes the re-check come up False."""
    import numpy as np  # noqa: F401  (kept local: aot is import-light)
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    # drop the IN-MEMORY compiled-executable caches too: lower().compile()
    # for a computation compiled before returns the same (cache-loaded)
    # executable object without consulting the persistent-cache config
    jax.clear_caches()
    try:
        return fn.lower(*args).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
        _cc.reset_cache()  # re-memoize under the restored settings


def _verify_blob(blob: bytes, devices, args) -> None:
    """Deserialize ``blob`` and EXECUTE it on ``args``, materializing the
    output — load alone is not enough. An executable that came out of the
    persistent compilation cache re-serializes into an XLA:CPU AOT blob
    whose target-machine feature list includes compile-time tuning
    preferences (+prefer-no-scatter/+prefer-no-gather) the host feature
    probe lacks; such a blob loads with a warning but fails at run time
    ("Buffer Definition Event ... not found"). Raises on any failure."""
    import numpy as np

    from jax.experimental.serialize_executable import deserialize_and_load

    payload, in_tree, out_tree = pickle.loads(blob)
    fn = deserialize_and_load(
        payload, in_tree, out_tree, execution_devices=devices
    )
    out = fn(*args)
    jax.tree.map(np.asarray, out)  # force execution + D2H


def _pack_one(
    executor, dataset, batch_size: int, max_length: int, with_scores: bool,
    path: str,
) -> dict:
    from jax.experimental.serialize_executable import serialize

    fn = executor._get_generate_fn(max_length, with_scores=with_scores)
    if isinstance(fn, AotGenerateDispatch):  # re-pack from a loaded store
        fn = fn.fallback()
    args = _example_args(executor, dataset, batch_size)
    devices = list(executor.mesh.devices.flatten())
    compiled = fn.lower(*args).compile()
    payload, in_tree, out_tree = serialize(compiled)
    blob = pickle.dumps((payload, in_tree, out_tree))
    try:
        _verify_blob(blob, devices, args)
    except Exception as e:
        # compile() likely hit the persistent compilation cache, and a
        # cache-loaded executable does not survive serialize->execute.
        # Self-heal: recompile fresh with the cache off and re-verify.
        log.warning(
            f"(!) AOT pack: serialized executable for batch={batch_size} "
            f"failed round-trip verification ({type(e).__name__}: {e}) — "
            f"recompiling without the persistent compilation cache"
        )
        compiled = _compile_without_persistent_cache(fn, args)
        payload, in_tree, out_tree = serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
        _verify_blob(blob, devices, args)  # must pass now; raise if not
    fname = _entry_filename(batch_size, max_length, with_scores)
    with open(os.path.join(path, fname), "wb") as f:
        f.write(blob)
    return {
        "file": fname,
        "batch_size": batch_size,
        "max_length": max_length,
        "with_scores": with_scores,
        "signature": _aval_signature(args),
        # the executable is bound to these devices; deserialize must bind to
        # the SAME set (not the backend's default "all local devices")
        "device_ids": [int(d.id) for d in executor.mesh.devices.flatten()],
        "bytes": len(blob),
    }


def load(executor, path: str) -> List[dict]:
    """Install the executables stored in ``path`` into ``executor``'s
    generate-fn table. Returns the loaded manifest entries, or ``[]`` (with
    a logged reason) when the store is absent or was packed for a different
    environment — the caller then serves via the normal jit path and may
    re-``pack()``."""
    manifest_path = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest_path):
        log.info(f"## AOT store: no manifest at {path} (first start?)")
        return []
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
    except Exception as e:
        log.warning(f"(!) AOT store: unreadable manifest ({e!r}) — ignoring")
        return []
    env = _env_fingerprint()
    stale = {
        k: (manifest.get(k), v)
        for k, v in env.items()
        if manifest.get(k) != v
    }
    if stale:
        log.warning(
            f"(!) AOT store at {path} was packed for a different environment "
            f"({stale}) — ignoring it; serve will compile and can re-pack"
        )
        return []
    from jax.experimental.serialize_executable import deserialize_and_load

    by_id = {int(d.id): d for d in jax.devices()}
    loaded = []
    for entry in manifest.get("entries", []):
        fname = os.path.join(path, entry["file"])
        try:
            devices = [by_id[i] for i in entry["device_ids"]]
            with open(fname, "rb") as f:
                payload, in_tree, out_tree = pickle.loads(f.read())
            fn = deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=devices
            )
        except Exception as e:
            log.warning(f"(!) AOT store: failed to load {fname} ({e!r}) — skipped")
            continue
        key = (entry["max_length"], bool(entry["with_scores"]))
        disp = executor._generate_fns.get(key)
        if not isinstance(disp, AotGenerateDispatch):
            disp = AotGenerateDispatch(executor, *key)
            executor._generate_fns[key] = disp
        disp.loaded[int(entry["batch_size"])] = [
            fn, [tuple(s) for s in entry["signature"]], False,
        ]
        loaded.append(entry)
    if loaded:
        log.info(
            f"## AOT store loaded: {len(loaded)} executable(s) from {path} — "
            f"serving starts with ZERO compiles"
        )
    return loaded
