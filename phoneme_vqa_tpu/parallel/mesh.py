"""Device mesh + sharding layer.

The reference has NO distributed backend — single device via
``model.to(config.DEVICE)`` (`/root/reference/core/executor/base_executor.py:194`).
This module is the framework's first-class TPU equivalent: a named
`jax.sharding.Mesh` over all local devices with a ``data`` axis (v5e-8 slice
→ 8-way data parallel over ICI), batch leaves sharded on axis 0, parameters
replicated. Gradient psums are inserted by XLA from the shardings — no
explicit collectives in model code. A ``model`` axis slot is reserved for
tensor parallelism (vit5-base fits one chip; TP is declared out of scope at
this scale, matching SURVEY §2.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch: dict) -> dict:
    """Place every batch leaf with its first axis split over the data axis.

    Falls back to replicated placement when the batch doesn't divide the
    mesh (correct, just not data-parallel) — keeps odd batch sizes working."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(batch)
    n = int(np.prod(mesh.devices.shape))
    sizes = {leaf.shape[0] for leaf in jax.tree.leaves(batch)}
    if any(s % n for s in sizes):
        return jax.device_put(batch, replicated(mesh))
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_tree(mesh: Optional[Mesh], tree):
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated(mesh))


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Round a batch size up so it divides evenly over the data axis."""
    return -(-batch_size // n_devices) * n_devices
