"""Device mesh + sharding layer.

The reference has NO distributed backend — single device via
``model.to(config.DEVICE)`` (`/root/reference/core/executor/base_executor.py:194`).
This module is the framework's first-class TPU equivalent: a named 2-axis
``jax.sharding.Mesh`` (``data`` x ``model``) over the local devices.

* ``data`` — batch leaves sharded on axis 0 (v5e-8 slice → 8-way data
  parallel over ICI). Gradient psums are inserted by XLA from the shardings —
  no explicit collectives in model code.
* ``model`` — Megatron-style tensor parallelism for the big matmuls: FFN
  ``wi*`` column-split / ``wo`` row-split, attention q/k/v column-split /
  ``o`` row-split, embeddings row-split over the vocab. The SAME path-keyed
  rule shards the optimizer state (adam mu/nu subtrees carry the parameter
  path names), so optimizer memory scales down with TP too.

Configured from YAML via ``MESH: {data: N, model: M}`` (data: -1 = all
remaining devices; default is pure DP). Multi-host: per-host batch shards are
assembled into global arrays with ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(mesh_cfg=None, devices=None) -> Mesh:
    """``mesh_cfg`` is the YAML ``MESH`` dict ({"data": N, "model": M}) or
    None (pure data-parallel over every local device)."""
    devices = list(devices if devices is not None else jax.devices())
    tp = int(mesh_cfg.get("model", 1)) if mesh_cfg else 1
    dp = int(mesh_cfg.get("data", -1)) if mesh_cfg else -1
    if dp <= 0:
        dp = max(1, len(devices) // tp)
    n = dp * tp
    if n > len(devices):
        raise ValueError(
            f"MESH data={dp} x model={tp} needs {n} devices, have {len(devices)}"
        )
    return Mesh(
        np.asarray(devices[:n]).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS)
    )


def mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(np.prod(mesh.devices.shape))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tree_shardings(mesh: Mesh, tree, zero1: bool = False):
    """Path-keyed TP sharding rules for a parameter (or optimizer-state) tree.

    With ``model`` axis size 1 everything is replicated (pure DP). The rules
    only fire on 2-D leaves whose split dimension divides the TP degree;
    anything else stays replicated — correct by construction, XLA inserts the
    all-gathers/psums the shardings imply.

    ``zero1=True`` (for OPTIMIZER-state trees): additionally shards every
    float leaf over the ``data`` axis on a dimension the TP rules left free —
    ZeRO-1: adam moments cost 1/dp the memory per chip, and XLA turns the
    update into reduce-scatter(grads) → sharded update → all-gather(updates)
    from the shardings alone."""
    tp = int(mesh.shape[MODEL_AXIS])
    dp = int(mesh.shape[DATA_AXIS])
    repl = replicated(mesh)

    def base_spec(path, leaf) -> P:
        shape = getattr(leaf, "shape", ())
        names = "/".join(getattr(p, "key", str(p)) for p in path)
        # SCAN_LAYERS stacks block params with a leading (num_layers,) axis
        # (`blocks/...` 3-D kernels): same Megatron rules, shifted one dim
        scanned = len(shape) == 3 and "blocks" in names
        if tp == 1 or not (len(shape) == 2 or scanned):
            return P()
        lead = (None,) if scanned else ()
        if shape[-1] % tp == 0 and (
            any(k in names for k in ("wi_0", "wi_1", "/wi/", "/q/", "/k/", "/v/"))
            or names.endswith(("q/kernel", "k/kernel", "v/kernel"))
        ):
            return P(*lead, None, MODEL_AXIS)
        if shape[-2] % tp == 0 and (
            "wo" in names or "/o/" in names or names.endswith("o/kernel")
        ):
            return P(*lead, MODEL_AXIS, None)
        if len(shape) == 2 and shape[0] % tp == 0 and "embedding" in names:
            return P(MODEL_AXIS, None)
        return P()

    def rule(path, leaf):
        spec = base_spec(path, leaf)
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", None)
        if (
            zero1
            and dp > 1
            and len(shape) >= 1
            and dtype is not None
            and jnp.issubdtype(dtype, jnp.floating)
        ):
            axes = list(spec) + [None] * (len(shape) - len(spec))
            for d in range(len(shape)):
                if axes[d] is None and shape[d] % dp == 0:
                    axes[d] = DATA_AXIS
                    return NamedSharding(mesh, P(*axes))
        if spec == P():
            return repl
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, tree)


def place_tree(mesh: Optional[Mesh], tree, zero1: bool = False):
    """Place a param/opt-state tree on the mesh per `tree_shardings`."""
    if mesh is None:
        return jax.device_put(tree)
    return jax.device_put(tree, tree_shardings(mesh, tree, zero1=zero1))


def shard_batch(mesh: Optional[Mesh], batch: dict, process_local: bool = False):
    """Place every batch leaf with its first axis split over the data axis.

    ``process_local=True`` means each host passed only its own rows (the
    loader's ``shard/num_shards`` slice): the local shards are assembled into
    one global array. Otherwise the batch is the full global batch (and must
    be identical on every host).

    Falls back to replicated placement when the batch doesn't divide the
    data axis (correct, just not data-parallel) — keeps odd batch sizes
    working."""
    if mesh is None or mesh_size(mesh) == 1:
        return jax.device_put(batch)
    if process_local and jax.process_count() > 1:
        sh = batch_sharding(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    n = int(mesh.shape[DATA_AXIS])
    sizes = {leaf.shape[0] for leaf in jax.tree.leaves(batch)}
    if any(s % n for s in sizes):
        _warn_replicated_fallback(sorted(sizes), n)
        return jax.device_put(batch, replicated(mesh))
    return jax.device_put(batch, batch_sharding(mesh))


_warned_replicated = False


def _warn_replicated_fallback(sizes, n):
    """One loud line (once per process) when a batch falls off the data axis:
    the replicated fallback is correct but runs at 1/data_parallelism speed,
    which should never be silent."""
    global _warned_replicated
    if _warned_replicated:
        return
    _warned_replicated = True
    from ..utils.logger import get_logger

    get_logger(__name__).warning(
        f"(!) batch size {sizes} does not divide the data axis ({n}): "
        f"falling back to REPLICATED placement — every chip computes the "
        f"full batch ({n}x slower than data-parallel). Pick a batch size "
        f"divisible by {n} (pad_batch_to_devices) to restore DP."
    )


def replicate_tree(mesh: Optional[Mesh], tree):
    if mesh is None or mesh_size(mesh) == 1:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated(mesh))


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Round a batch size up so it divides evenly over the data axis."""
    return -(-batch_size // n_devices) * n_devices
