"""Test harness setup.

Must run before any `import jax`: tests run on a virtual 8-device CPU mesh
so multi-chip sharding logic is exercised without TPU hardware.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (overriding JAX_PLATFORMS) — every op would round-trip the TPU
# tunnel. Flip back to the virtual 8-device CPU mesh for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the test tier: programs are identical
# across runs (fixed tiny shapes), so repeat runs — the development inner
# loop — skip most XLA compiles. First/cold run is unchanged. Opt out with
# TEST_COMPILE_CACHE=0 (e.g. to measure cold-compile wall time).
if os.environ.get("TEST_COMPILE_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO_ROOT, ".jax_cache_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
