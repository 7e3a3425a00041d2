"""Checkpoint manager: Orbax-backed last/best checkpoints with auto-resume.

Same logical contract as the reference
(`/root/reference/core/executor/base_executor.py:100-217`):
* ``last_ckp`` saved every epoch, ``best_ckp`` on metric improvement
* contents: {params, opt_state, step, epoch, best_score}
* train auto-resumes from ``last_ckp`` if present
* eval/predict load ``{evaltype|predicttype}_ckp`` with a ``./models``
  fallback and a hard error otherwise
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..utils.logger import get_logger

log = get_logger(__name__)


class CheckpointManager:
    def __init__(self, save_path: str):
        self.save_path = os.path.abspath(save_path or "./models")
        os.makedirs(self.save_path, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _dir(self, name: str, root: Optional[str] = None) -> str:
        return os.path.join(root or self.save_path, f"{name}_ckp")

    def save(self, name: str, tree: Any, block: bool = False) -> None:
        """Async save (orbax stages and writes in the background so the train
        loop keeps running — SURVEY §5's preemption-safe cadence plan);
        ``block=True`` or a subsequent save/restore waits for completion."""
        path = self._dir(name)
        self._ckptr.save(path, tree, force=True)
        if block:
            self._ckptr.wait_until_finished()
        log.info(f"!---------Saved {name}_ckp----------!")

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._dir(name))

    def mtime(self, name: str) -> Optional[float]:
        """Modification time of the checkpoint dir (None if absent). Orbax
        finalizes saves by renaming the tmp dir into place, so a changed
        mtime means a complete new checkpoint — the serving hot-reload
        watcher polls this."""
        for root in (self.save_path, "./models"):
            path = self._dir(name, root)
            if os.path.isdir(path):
                return os.path.getmtime(path)
        return None

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure of ``target`` (shape/dtype template)."""
        self._ckptr.wait_until_finished()
        for root in (self.save_path, "./models"):
            path = self._dir(name, root)
            if os.path.isdir(path):
                abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
                restored = self._ckptr.restore(path, abstract)
                log.info(f"###Loaded {name}_ckp from {path}")
                return restored
        raise FileNotFoundError(f"(!) {name}_ckp is required (!)")

    def restore_raw(self, name: str) -> Any:
        """Restore without a template (plain nested dict of arrays) — used by
        eval/predict, which need only the params subtree."""
        self._ckptr.wait_until_finished()
        for root in (self.save_path, "./models"):
            path = self._dir(name, root)
            if os.path.isdir(path):
                restored = ocp.PyTreeCheckpointer().restore(path)
                log.info(f"###Loaded {name}_ckp from {path}")
                return restored
        raise FileNotFoundError(f"(!) {name}_ckp is required (!)")
