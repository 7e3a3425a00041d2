"""OCR / object-region feature adapters.

Contract (`/root/reference/core/data/utils.py:6-88`): scan a directory of
per-image pickled ``.npy`` dicts and produce a DataFrame keyed by
``image_id = float(filename_stem)``.

* OCR files hold ``texts`` + ``boxes``; boxes are scaled by
  (w_scale, h_scale) with width/height treated as 1 (the reference
  hardcodes them — boxes are assumed pre-normalized to [0, 1]).
* Object files hold ``object_list`` + ``region_boxes`` + true
  ``height``/``width`` used for normalization.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd

from ..utils.logger import get_logger

log = get_logger(__name__)


def _load_npy_dict(path: str) -> dict:
    return np.load(path, allow_pickle=True).tolist()


def _dir_stat_fingerprint(root: str) -> str:
    """Directory identity from (name, size, mtime_ns) of every entry —
    O(files) stats, no content reads. mtime-keyed, not content-keyed: a
    rewritten-in-place file with identical size+mtime would go stale
    (documented in docs/DATA.md)."""
    h = hashlib.sha1()
    for fname in sorted(os.listdir(root)):
        st = os.stat(os.path.join(root, fname))
        h.update(f"{fname}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def _cached_adapt(root: str, cache_dir, tag: str, build):
    """Adapted-frame cache (rides ``FEATURE_CACHE``): scanning a production
    feature store re-reads every per-image ``.npy`` pickle; the adapted
    DataFrame is persisted per (directory fingerprint, adapter, scales)
    instead. Atomic writes; unreadable entries rebuild."""
    if not cache_dir:
        return build()
    key = hashlib.sha1(f"{tag}|{_dir_stat_fingerprint(root)}".encode()).hexdigest()[:20]
    path = os.path.join(cache_dir, f"adapt_{key}.pkl")
    if os.path.isfile(path):
        try:
            df = pd.read_pickle(path)
            log.info(f"# Adapted-frame cache HIT {tag} ({len(df)} rows)")
            return df
        except Exception as e:
            log.warning(f"adapted-frame cache {path} unreadable ({e}); rebuilding")
    df = build()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".pkl.tmp")
        os.close(fd)
        df.to_pickle(tmp)
        os.replace(tmp, path)
        log.info(f"# Adapted-frame cache MISS -> wrote {tag} ({len(df)} rows)")
    except Exception as e:  # cache failure must never kill the run
        log.warning(f"adapted-frame cache write failed ({e}); continuing uncached")
    return df


def _scale_boxes(boxes, width: float, height: float, w_scale: float, h_scale: float):
    out = []
    for x0, y0, x1, y1 in np.asarray(boxes, dtype=np.float64).reshape(-1, 4):
        out.append(
            [
                float(x0 / width * w_scale),
                float(y0 / height * h_scale),
                float(x1 / width * w_scale),
                float(y1 / height * h_scale),
            ]
        )
    return out


def textlayout_ocr_adapt(
    ocr_root: str, h_scale: float = 1000, w_scale: float = 1000, cache_dir=None
) -> pd.DataFrame:
    def build():
        rows = []
        for fname in os.listdir(ocr_root):
            record = _load_npy_dict(os.path.join(ocr_root, fname))
            rows.append(
                {
                    "image_id": float(fname[:-4]),
                    "texts": list(record["texts"]),
                    # width/height fixed to 1: boxes arrive pre-normalized
                    "bboxes": _scale_boxes(record["boxes"], 1.0, 1.0, w_scale, h_scale),
                }
            )
        return pd.DataFrame(rows, columns=["image_id", "texts", "bboxes"])

    return _cached_adapt(ocr_root, cache_dir, f"ocr:{h_scale}:{w_scale}", build)


def textlayout_obj_adapt(
    obj_root: str, h_scale: float = 1000, w_scale: float = 1000, cache_dir=None
) -> pd.DataFrame:
    def build():
        rows = []
        for fname in os.listdir(obj_root):
            record = _load_npy_dict(os.path.join(obj_root, fname))
            rows.append(
                {
                    "image_id": float(fname[:-4]),
                    "obj_labels": list(record["object_list"]),
                    "obj_bboxes": _scale_boxes(
                        record["region_boxes"],
                        float(record["width"]),
                        float(record["height"]),
                        w_scale,
                        h_scale,
                    ),
                }
            )
        return pd.DataFrame(rows, columns=["image_id", "obj_labels", "obj_bboxes"])

    return _cached_adapt(obj_root, cache_dir, f"obj:{h_scale}:{w_scale}", build)
