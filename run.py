"""PhonoVQA-TPU CLI.

Identical surface to the reference (`/root/reference/run.py:10-21`):
    python run.py --config-file F --mode {train,eval,predict}
                  [--evaltype {last,best}] [--predicttype {last,best}]
The EXECUTOR string in the YAML selects the executor from the registry.
"""

import argparse

from phoneme_vqa_tpu import registry_setup  # populates the registries
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.utils.registry import EXECUTORS


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", type=str, required=True)
    parser.add_argument(
        "--mode", type=str, required=True, choices=["train", "eval", "predict"]
    )
    parser.add_argument("--evaltype", type=str, default="last", choices=["last", "best"])
    parser.add_argument(
        "--predicttype", type=str, default="best", choices=["last", "best"]
    )
    return parser.parse_args()


def main():
    args = parse_args()
    config = get_config(args.config_file)
    import os

    import jax

    # Honor JAX_PLATFORMS=cpu even when a sitecustomize force-selected a
    # backend at interpreter start (the axon TPU relay does this) — lets
    # `JAX_PLATFORMS=cpu` drive the CLI on a virtual CPU mesh. Only the cpu
    # override is applied: the relay environment exports JAX_PLATFORMS with
    # its own plugin name, which is not a backend this process can re-select
    # by string (the plugin registers itself at interpreter start).
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from phoneme_vqa_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed(config)  # no-op single host
    try:  # persistent XLA compilation cache (remote compiles are slow)
        cache_dir = config.get("COMPILE_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    executor_cls = EXECUTORS.get(config.EXECUTOR)
    executor = executor_cls(config, args.mode, args.evaltype, args.predicttype)
    executor.run()


if __name__ == "__main__":
    main()
