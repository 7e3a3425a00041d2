"""SaL 2D relative position bias: T5-1D sequence bias + SCP spatial bias.

Contract (`/root/reference/core/model/modules/SaL_utils.py:24-223`):
* 1D: T5-style bucketed sequence-distance bias over the full fused sequence.
* SCP ("Spatial Circle Position"): OCR bbox centers are snapped to an 11x11
  grid; the pairwise euclidean grid distance x5 is bucketed (bidirectional,
  32 buckets, max_distance=100) and embedded; added ONLY to the OCR x OCR
  block ``[max_ques : max_ques+max_ocr]²``.

The reference computes SCP on numpy each batch — a device->host->device
round trip inside forward (`SaL_utils.py:163-168`). Here the 11x11x11x11
distance table is a compile-time constant, and the bias is returned in
FACTORED form (`ops.sal_fused_attention.FusedSalBias`): the batch-independent
1D bias `(H, L, L)`, the SCP bias in 121-grid-cell space `(H, C, C)`, and the
per-token cell index `(B, L)`. On TPU the attention kernel reconstructs the
per-pair bias on-chip, so the `(B, H, L, L)` f32 tensor (~173 MB at SaL-base
shapes, re-read by every encoder layer) never exists in HBM; everywhere else
`dot_product_attention` materializes it (`FusedSalBias.materialize`), which
is numerically identical to the direct formulation.

Also fixed (documented divergence): the reference never folds the padding
mask into the injected bias, so its SaL encoder attends to padding
(HF T5Attention skips mask-addition when position_bias is supplied); our
attention applies the key mask regardless.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rel_bias import relative_position_bucket

GRID = 11


def _grid_distance_table() -> np.ndarray:
    """(121, 121) table: euclidean distance between grid cells x5, floored to
    int (the reference casts the float table to long)."""
    xs, ys = np.mgrid[0:GRID, 0:GRID]
    cells = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    diff = cells[:, None, :] - cells[None, :, :]
    return (np.sqrt((diff**2).sum(-1)) * 5).astype(np.int32)


class Sal2DPositionBias(nn.Module):
    num_heads: int
    num_buckets: int = 32
    max_distance_1d: int = 128
    max_distance_scp: int = 100
    # train-time distance augmentation x U(0.8, 1.25)
    # (RelativePositionBiasBase augmentation flag, SaL_utils.py:85-87;
    # present in the reference API but never enabled by its configs)
    augmentation: bool = False

    @nn.compact
    def __call__(
        self,
        seq_len: int,
        ocr_coordinates: jnp.ndarray,  # (B, L_ocr, 4) float in [0, 1]
        max_ques: int,
        max_ocr: int,
        deterministic: bool = True,
    ):
        """Returns a `FusedSalBias` (factored; `.materialize()` recovers the
        `(B, H, L, L)` f32 additive bias of the direct formulation)."""
        from ..ops.sal_fused_attention import SENTINEL, FusedSalBias

        aug_scale = 1.0
        if self.augmentation and not deterministic:
            aug_scale = jax.random.uniform(
                self.make_rng("dropout"), (), minval=0.8, maxval=1.25
            )
        embed_1d = nn.Embed(
            self.num_buckets, self.num_heads, param_dtype=jnp.float32, name="rel1d"
        )
        embed_scp = nn.Embed(
            self.num_buckets, self.num_heads, param_dtype=jnp.float32, name="scp"
        )

        pos = jnp.arange(seq_len)
        rel_1d = (pos[None, :] - pos[:, None]).astype(jnp.float32) * aug_scale
        buckets_1d = relative_position_bucket(
            rel_1d.astype(jnp.int32),
            bidirectional=True,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance_1d,
        )
        bias_1d = embed_1d(buckets_1d).transpose(2, 0, 1)  # (H, L, L)

        # SCP between grid CELLS (121 of them) — per-pair values are a pure
        # function of the two cells, so embed the 121x121 distance table once
        table = jnp.asarray(_grid_distance_table())  # (121, 121) int
        dist121 = (table.astype(jnp.float32) * aug_scale).astype(jnp.int32)
        buckets121 = relative_position_bucket(
            dist121,
            bidirectional=True,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance_scp,
        )
        cell_bias = embed_scp(buckets121).transpose(2, 0, 1)  # (H, 121, 121)
        # sentinel row/col: tokens outside the OCR block contribute 0
        cell_bias = jnp.pad(cell_bias, ((0, 0), (0, 1), (0, 1)))

        # per-token grid cell from OCR bbox centers; SENTINEL elsewhere
        cx = ocr_coordinates[..., (0, 2)].mean(-1)
        cy = ocr_coordinates[..., (1, 3)].mean(-1)
        ix = jnp.clip(jnp.floor(cx * GRID).astype(jnp.int32), 0, GRID - 1)
        iy = jnp.clip(jnp.floor(cy * GRID).astype(jnp.int32), 0, GRID - 1)
        cell_ocr = ix * GRID + iy  # (B, L_ocr)
        b = ocr_coordinates.shape[0]
        cell = jnp.full((b, seq_len), SENTINEL, jnp.int32)
        cell = jax.lax.dynamic_update_slice(cell, cell_ocr, (0, max_ques))
        assert max_ques + max_ocr <= seq_len

        return FusedSalBias(bias1d=bias_1d, cell_bias=cell_bias, cell=cell)
