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

import os

import numpy as np
import pandas as pd


def _load_npy_dict(path: str) -> dict:
    return np.load(path, allow_pickle=True).tolist()


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


def textlayout_ocr_adapt(ocr_root: str, h_scale: float = 1000, w_scale: float = 1000) -> pd.DataFrame:
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


def textlayout_obj_adapt(obj_root: str, h_scale: float = 1000, w_scale: float = 1000) -> pd.DataFrame:
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
