"""Fixed-shape array dataset + batch iterator (XLA-friendly input pipeline).

The reference wraps eagerly-featurized python lists in a torch DataLoader
with worker processes (`/root/reference/core/executor/base_executor.py:219-231`).
Here featurization lands directly in packed, padded numpy arrays (static
shapes — the reference's pad-to-max design is kept because it is exactly
what XLA wants), and batching is plain array slicing:

* train: shuffled epochs, final partial batch dropped (static step shape)
* eval/predict: in-order, final partial batch padded up to full size with a
  ``n_valid`` count so every step reuses one compiled program
* multi-host: ``shard`` / ``num_shards`` slice each host's rows
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np


class ArrayDataset:
    """A dict of equal-length numpy arrays + optional lazy per-row extras."""

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        image_ids=None,
        answers=None,
        lazy_fields: Optional[Dict[str, Callable[[np.ndarray], np.ndarray]]] = None,
    ):
        lengths = {k: len(v) for k, v in arrays.items()}
        assert len(set(lengths.values())) <= 1, f"ragged dataset: {lengths}"
        self.arrays = arrays
        self.image_ids = image_ids
        self.answers = answers
        # lazy_fields: name -> fn(indices) -> array (e.g. pixel values from disk)
        self.lazy_fields = lazy_fields or {}

    def __len__(self) -> int:
        return len(next(iter(self.arrays.values())))

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        batch = {k: v[idx] for k, v in self.arrays.items()}
        for name, fn in self.lazy_fields.items():
            batch[name] = fn(idx)
        return batch


def batch_iterator(
    dataset: ArrayDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    pad_final: bool = True,
    shard: int = 0,
    num_shards: int = 1,
) -> Iterator[Tuple[Dict[str, np.ndarray], int]]:
    """Yields (batch dict, n_valid). Batches always have ``batch_size`` rows
    when ``pad_final`` (final short batch repeats its last row)."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.RandomState(seed).permutation(n)
    order = order[shard::num_shards]

    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        n_valid = len(idx)
        if n_valid < batch_size:
            if drop_last:
                return
            if pad_final:
                idx = np.concatenate(
                    [idx, np.full(batch_size - n_valid, idx[-1], idx.dtype)]
                )
        yield dataset.gather(idx), n_valid


def num_batches(n_rows: int, batch_size: int, drop_last: bool = False) -> int:
    return n_rows // batch_size if drop_last else -(-n_rows // batch_size)


def prefetch(iterator, depth: int = 2):
    """Background-thread prefetch: overlaps host-side batch assembly (lazy
    .npy feature loads) with device compute — the role torch DataLoader
    workers (NUMWORKERS) play in the reference
    (`base_executor.py:219-231`)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def make_image_loader(base_img_path: str, image_ids) -> Callable[[np.ndarray], np.ndarray]:
    """Lazy ViT pixel loader: {base}/{image_id}.npy dicts holding 'image'
    (contract: /root/reference/core/data/LaTrDataset.py:40-42). Handles both
    (1, C, H, W) and (C, H, W) stored layouts."""

    def load(idx: np.ndarray) -> np.ndarray:
        imgs = []
        for i in idx:
            image_id = image_ids[int(i)]
            # the reference writes float ids like 7.0 as "7.npy" via str();
            # accept both spellings
            for stem in (str(image_id), str(int(image_id))):
                path = os.path.join(base_img_path, stem + ".npy")
                if os.path.isfile(path):
                    break
            record = np.load(path, allow_pickle=True).tolist()
            img = np.asarray(record["image"], np.float32)
            if img.ndim == 4:
                img = img[0]
            imgs.append(img)
        return np.stack(imgs)

    return load
