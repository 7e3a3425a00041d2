"""Param-tree layout conversion between unrolled and scanned layer stacks.

``SCAN_LAYERS: true`` compiles each transformer stack as one `lax.scan` over
(num_layers,)-stacked block params (`t5.T5Config.scan_layers`). That changes
the param tree layout:

    unrolled: {"block_0": {...}, "block_1": {...}, ...}
    scanned:  {"blocks": {...}}   # every leaf gains a leading (L,) axis

These helpers convert whole model param trees between the two layouts so
checkpoints and HF imports written in one layout load in the other. They walk
the tree and transform every dict that contains a contiguous ``block_0..N-1``
family (or a ``blocks`` subtree whose leaves carry the stacked axis),
covering the T5 encoder/decoder and the ViT at once.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
import jax

_BLOCK_RE = re.compile(r"^block_(\d+)$")


def _block_indices(d: Dict[str, Any]):
    idx = sorted(
        int(m.group(1)) for k in d for m in [_BLOCK_RE.match(k)] if m
    )
    return idx if idx and idx == list(range(len(idx))) else None


def has_scanned_blocks(tree) -> bool:
    """True if any subtree uses the scanned ``blocks`` layout."""
    if not isinstance(tree, dict):
        return False
    return any(
        k == "blocks" or has_scanned_blocks(v) for k, v in tree.items()
    )


def stack_block_params(tree):
    """Unrolled layout -> scanned layout (``block_i/...`` -> ``blocks/...``)."""
    if not isinstance(tree, dict):
        return tree
    idx = _block_indices(tree)
    out = {}
    if idx is not None:
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[stack_block_params(tree[f"block_{i}"]) for i in idx],
        )
        out["blocks"] = stacked
    for k, v in tree.items():
        if _BLOCK_RE.match(k):
            continue
        out[k] = stack_block_params(v)
    return out


def unstack_block_params(tree):
    """Scanned layout -> unrolled layout (``blocks/...`` -> ``block_i/...``)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "blocks" and isinstance(v, dict):
            leaves = jax.tree.leaves(v)
            n = leaves[0].shape[0] if leaves else 0
            for i in range(n):
                out[f"block_{i}"] = jax.tree.map(lambda leaf: leaf[i], v)
        else:
            out[k] = unstack_block_params(v)
    return out
