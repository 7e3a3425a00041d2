"""Multi-host with REAL processes (VERDICT r2 item 2).

Launches 2 subprocesses that join one jax.distributed job (local
coordinator), each with 4 virtual CPU devices -> an 8-device global mesh
split across 2 hosts. Each runs a REAL `BaseExecutor` train epoch: per-host
loader shards (`batch_iterator(shard=host, num_shards=2)`) feed
`shard_batch(process_local=True)`, which assembles global arrays with
`jax.make_array_from_process_local_data` (`parallel/mesh.py:145-149`) —
the code path that is a no-op in every other test.

Gate: both processes report process_count == 2 and the SAME epoch loss as a
single-process 8-device run of the identical config (the global batch is the
same row SET — interleaved shard slices of one seeded permutation — and the
fixture trains with dropout 0, so the mean CE is permutation-invariant).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_epoch_matches_single(tmp_path):
    from .fixtures import make_latr_fixture, tiny_latr_yaml

    paths = make_latr_fixture(str(tmp_path), n_rows=16)
    yaml_path = tiny_latr_yaml(
        paths, os.path.join(str(tmp_path), "ck"), NUM_EPOCHS=1, SAVE=False,
        TRAIN_BATCH_SIZE=8, MESH={"data": 8},
    )

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
                 yaml_path],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )

    results = {}
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        assert proc.returncode == 0, f"process {pid}:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-3000:]
        results[pid] = json.loads(line[-1][len("RESULT "):])

    for pid, r in results.items():
        assert r["process_count"] == 2
        assert r["n_local_devices"] == 4
    assert np.isclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)

    # single-process 8-device run of the same config (in a subprocess so the
    # parent's jax state never sees the distributed runtime)
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        JAX_NUM_PROCESSES="1",
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    single = subprocess.run(
        [sys.executable, "-c",
         f"""
import json, os, sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from phoneme_vqa_tpu import registry_setup
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS
config = get_config({yaml_path!r})
ex = EXECUTORS.get(config.EXECUTOR)(config, mode="train")
print("RESULT", json.dumps({{"loss": float(ex._train_epoch(1))}}))
"""],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stdout[-2000:] + single.stderr[-2000:]
    line = [l for l in single.stdout.splitlines() if l.startswith("RESULT ")][-1]
    loss_single = json.loads(line[len("RESULT "):])["loss"]

    # same row set, dropout 0 -> mean CE equal up to f32 reduction order
    assert np.isclose(results[0]["loss"], loss_single, rtol=1e-5), (
        results, loss_single
    )
