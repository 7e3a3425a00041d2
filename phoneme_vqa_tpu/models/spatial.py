"""2D layout (bounding-box) embedding.

Contract: the reference's `SpatialModule` (`/root/reference/core/model/LaTr.py:14-39`)
sums six embeddings over 1024 position buckets: x0, y0, x1, y1, width, height.
Here the six tables live in one (6, buckets, d) parameter and the lookup is a
single gather + sum over the component axis — one fused op instead of six.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SpatialModule(nn.Module):
    max_2d_positions: int = 1024
    d_model: int = 768
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, coordinates: jnp.ndarray) -> jnp.ndarray:
        """coordinates (B, L, 6) int -> (B, L, d_model)."""
        tables = self.param(
            "tables",
            nn.initializers.normal(1.0),
            (6, self.max_2d_positions, self.d_model),
            jnp.float32,
        )
        coords = jnp.clip(coordinates, 0, self.max_2d_positions - 1)
        component = jnp.arange(6)[None, None, :]  # (1, 1, 6)
        gathered = tables[component, coords]  # (B, L, 6, d)
        return gathered.sum(axis=2).astype(self.dtype)
