"""Multi-host (TPU pod slice) runtime initialization.

The reference is single-device (`base_executor.py:194`); this is the
framework's multi-host entry. One call per process, before any jax device
use:

* On Cloud TPU pods `jax.distributed.initialize()` auto-discovers the
  coordinator from the TPU metadata; elsewhere it reads
  ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
* After init, every host sees the global device set: `parallel.mesh`
  builds the global mesh, `BaseExecutor._train_epoch` feeds each host its
  row slice, and `shard_batch(process_local=True)` assembles global arrays.

Single-host runs (no coordinator configured, ``MULTIHOST`` unset) are a
no-op — safe to call unconditionally from `run.py`.
"""

from __future__ import annotations

import os

from ..utils.logger import get_logger

log = get_logger(__name__)

_INITIALIZED = False


def maybe_initialize_distributed(config=None) -> bool:
    """Initialize jax.distributed when multi-host launch is requested.

    Triggers when the YAML sets ``MULTIHOST: true`` or the standard JAX
    coordinator env vars are present. Returns True if initialization ran.
    Idempotent."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    want = bool(config and config.get("MULTIHOST")) or bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    import jax

    kwargs = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    log.info(
        f"# jax.distributed initialized: process {jax.process_index()}"
        f"/{jax.process_count()}, {len(jax.devices())} global devices"
    )
    return True
