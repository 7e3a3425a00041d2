"""Frozen-ViT encoding cache (``VIT_CACHE: true``).

The reference recomputes the full ViT forward on every train step and every
eval batch even though the ViT is frozen in the whole LaTr family
(`/root/reference/core/model/LaTr.py:54-56`, `CustomizedLaTr.py:57-59`,
`PhonemeLaTr.py:64-66`) — a designed-in inefficiency of the same class as
the per-batch numpy SCP detour. Since the ViT here has no dropout
(`models/vit.py`), its forward is a pure function of (weights, pixels): with
frozen weights the encodings can be computed ONCE per unique image and fed
to the model as a batch input, which

* removes the ViT forward from every subsequent train/eval step, exactly
  (same bf16 compute from the same weights — bit-identical activations);
* dedups by image: VQA datasets carry several questions per image, so even
  a single eval pass does less ViT work than the uncached path;
* shrinks H2D per batch (a 197x768 bf16 encoding is ~1/2 of a 3x224x224
  f32 pixel tensor).

The executor decides WHEN caching is valid (frozen ViT or static weights —
`train/base_executor.py: _maybe_attach_vit_cache`); this module only does
the mechanical work: run the encoder over unique images, swap the dataset's
lazy ``pixel_values`` field for a lazy ``vit_encodings`` gather.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from ..utils.logger import get_logger

log = get_logger(__name__)


def attach_vit_cache(
    dataset,
    encode_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int,
    max_bytes: int = 8 << 30,
) -> Tuple[bool, str]:
    """Precompute frozen-ViT encodings for every unique image in ``dataset``
    and replace its lazy ``pixel_values`` field with a lazy ``vit_encodings``
    gather. Returns ``(attached, reason)``.

    ``encode_fn(pixels) -> encodings`` must be the model's image encoder at
    the CURRENT weights (pre-projector — the projector stays trainable and
    runs inside the step). Batches fed to ``encode_fn`` always have
    ``batch_size`` rows (short final chunk padded by repeating its last row)
    so one compiled program serves the whole precompute.
    """
    if getattr(dataset, "_vit_cache_attached", False):
        return True, "already attached"
    if "pixel_values" not in dataset.lazy_fields:
        return False, "dataset has no lazy pixel_values field"
    if dataset.image_ids is None:
        return False, "dataset carries no image_ids (cannot dedup)"

    ids = np.asarray([str(i) for i in dataset.image_ids])
    uniq, first_rows, row_to_uniq = np.unique(
        ids, return_index=True, return_inverse=True
    )
    loader = dataset.lazy_fields["pixel_values"]

    chunks = []
    for start in range(0, len(uniq), batch_size):
        rows = first_rows[start : start + batch_size].astype(np.int64)
        n_valid = len(rows)
        if n_valid < batch_size:
            rows = np.concatenate(
                [rows, np.full(batch_size - n_valid, rows[-1], np.int64)]
            )
        enc = np.asarray(encode_fn(loader(rows)))[:n_valid]
        if start == 0:
            total = int(enc[:1].nbytes) * len(uniq)
            if total > max_bytes:
                return False, (
                    f"encoding table would be {total / 2**30:.1f} GiB for "
                    f"{len(uniq)} unique images (cap {max_bytes / 2**30:.1f} "
                    "GiB; raise VIT_CACHE_MAX_GB to override)"
                )
        chunks.append(enc)
    table = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]

    lazy = dict(dataset.lazy_fields)
    del lazy["pixel_values"]
    lazy["vit_encodings"] = lambda idx: table[
        row_to_uniq[np.asarray(idx, np.int64)]
    ]
    dataset.lazy_fields = lazy
    dataset._vit_cache_attached = True
    return True, (
        f"{len(uniq)} unique images for {len(ids)} rows "
        f"({table.nbytes / 2**20:.1f} MiB, dtype {table.dtype})"
    )
