"""Subprocess worker for the 2-process multi-host test
(`test_multihost_procs.py`). Each process sees 4 virtual CPU devices
(XLA_FLAGS) and joins an 8-device global mesh via jax.distributed; it then
runs ONE real `BaseExecutor` train epoch with per-host loader shards +
`shard_batch(process_local=True)` and prints the loss as JSON.

Usage: python tests/multihost_worker.py <yaml_path>
(env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID,
 JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.parallel.multihost import maybe_initialize_distributed
from phoneme_vqa_tpu.utils.registry import EXECUTORS


def main():
    yaml_path = sys.argv[1]
    assert maybe_initialize_distributed(None), "distributed init did not run"
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    assert len(jax.devices()) == 8, jax.devices()

    config = get_config(yaml_path)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
    loss = ex._train_epoch(1)
    print(
        "RESULT " + json.dumps(
            {
                "process": jax.process_index(),
                "process_count": jax.process_count(),
                "loss": float(loss),
                "n_local_devices": len(jax.local_devices()),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
