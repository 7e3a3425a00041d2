"""On-disk featurization cache (YAML ``FEATURE_CACHE: <dir>``).

Featurization is an eager host-side pass (packed-array assembly at a few
thousand rows/s); at production dataset sizes every run — and every
preemption auto-resume restart — pays minutes of CPU before the first
train/eval step. The cache persists the packed arrays keyed by a
fingerprint of everything that determines them:

* the dataframe *contents* (qa + ocr/obj features), not file paths/mtimes
* every featurization parameter (max lengths, truncation, ...)
* the dataset class doing the featurizing and a cache format VERSION
* the tokenizer identity (class + vocab hash where the vocab is
  introspectable, class + size otherwise)
* an executor-provided ``cache_tag`` covering the answer encoder
  (Customized/Phoneme families encode answers with their decode tokenizer)

A hit loads each array memory-mapped (``np.load(mmap_mode="r")``) — startup
goes from O(dataset) tokenizer work to O(1) file opens; batch ``gather``
then reads only the rows it slices. Writes are atomic (tempdir +
``os.replace``) so a preempted first run never leaves a half-written entry.

The reference re-tokenizes every run (`core/data/LaTrDataset.py:12-146`);
this subsystem has no reference counterpart.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..utils.logger import get_logger

log = get_logger(__name__)

VERSION = 1

BuildFn = Callable[[], Tuple[Dict[str, np.ndarray], list, list]]


def df_fingerprint(df: pd.DataFrame) -> str:
    """Content hash of a dataframe, robust to unhashable cells (the OCR
    frames hold list-valued bbox/text columns): object columns are hashed
    through their string form; ordering matters (row order is featurization
    order)."""
    h = hashlib.sha1()
    h.update(",".join(map(str, df.columns)).encode())
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            s = s.astype(str)
        h.update(pd.util.hash_pandas_object(s, index=False).values.tobytes())
    return h.hexdigest()[:16]


def tokenizer_tag(tok) -> str:
    """Identity tag for any tokenizer: class + vocab hash when the vocab is
    introspectable (HF tokenizers and BPETokenizer expose get_vocab();
    structured phoneme tokenizers a .vocab dict), class + len otherwise."""
    name = type(tok).__name__
    get_vocab = getattr(tok, "get_vocab", None) or getattr(
        getattr(tok, "tokenizer", None), "get_vocab", None
    )
    vocab = None
    if callable(get_vocab):
        try:
            vocab = get_vocab()
        except Exception:
            vocab = None
    if vocab is None:
        vocab = getattr(tok, "vocab", None)
    if isinstance(vocab, dict):
        blob = json.dumps(sorted((str(k), str(v)) for k, v in vocab.items()))
        return f"{name}:{hashlib.sha1(blob.encode()).hexdigest()[:12]}"
    try:
        return f"{name}:{len(tok)}"
    except Exception:
        return name


def compute_key(parts: dict) -> str:
    blob = json.dumps(parts, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:20]


def _load(entry_dir: str):
    with open(os.path.join(entry_dir, "meta.json")) as f:
        meta = json.load(f)
    arrays = {
        name: np.load(os.path.join(entry_dir, name + ".npy"), mmap_mode="r")
        for name in meta["arrays"]
    }
    return arrays, meta["image_ids"], meta["answers"]


def _save(entry_dir: str, arrays: Dict[str, np.ndarray], image_ids, answers,
          parts: dict) -> None:
    parent = os.path.dirname(entry_dir) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".tmp_")
    try:
        for name, arr in arrays.items():
            np.save(os.path.join(tmp, name + ".npy"), np.ascontiguousarray(arr))
        meta = {
            "arrays": sorted(arrays),
            "image_ids": list(image_ids) if image_ids is not None else None,
            "answers": [str(a) for a in answers] if answers is not None else None,
            "parts": {k: str(v) for k, v in parts.items()},  # debuggability
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        try:
            os.replace(tmp, entry_dir)  # atomic publish
        except OSError:
            pass  # another process published first; keep theirs
    finally:
        if os.path.isdir(tmp):  # lost the race (or failed): discard
            shutil.rmtree(tmp, ignore_errors=True)


def get_or_build(
    cache_dir: Optional[str],
    parts: dict,
    build: BuildFn,
) -> Tuple[Dict[str, np.ndarray], Optional[List], Optional[List]]:
    """Returns (arrays, image_ids, answers), from cache when an entry
    matching ``parts`` exists, else by calling ``build()`` and persisting
    the result. ``cache_dir`` None/empty disables caching entirely."""
    if not cache_dir:
        return build()
    parts = dict(parts, _version=VERSION)
    key = compute_key(parts)
    entry_dir = os.path.join(cache_dir, key)
    if os.path.isfile(os.path.join(entry_dir, "meta.json")):
        try:
            arrays, image_ids, answers = _load(entry_dir)
            n = len(next(iter(arrays.values()))) if arrays else 0
            log.info(f"# Feature cache HIT {key} ({n} rows) at {entry_dir}")
            return arrays, image_ids, answers
        except Exception as e:  # corrupt entry: rebuild over it
            log.warning(f"feature cache entry {entry_dir} unreadable ({e}); rebuilding")
    arrays, image_ids, answers = build()
    try:
        _save(entry_dir, arrays, image_ids, answers, parts)
        log.info(f"# Feature cache MISS -> wrote {key} at {entry_dir}")
    except Exception as e:  # cache write failure must never kill training
        log.warning(f"feature cache write failed ({e}); continuing uncached")
    return arrays, image_ids, answers
