"""T5 relative position bucketing (pure jnp).

The bucketing scheme T5 uses for its relative attention bias — and which the
SaL 2D spatial bias reuses for distances
(`/root/reference/core/model/modules/SaL_utils.py:60-76` delegates to HF's
`_relative_position_bucket`): half the buckets are exact small offsets, the
other half log-spaced up to ``max_distance``; bidirectional variants split
buckets between signs.
"""

from __future__ import annotations

import jax.numpy as jnp


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)

    max_exact = num_buckets // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-20) / jnp.log(
        max_distance / max_exact
    )
    val_if_large = max_exact + (log_ratio * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)
