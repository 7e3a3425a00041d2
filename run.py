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
    executor_cls = EXECUTORS.get(config.EXECUTOR)
    executor = executor_cls(config, args.mode, args.evaltype, args.predicttype)
    executor.run()


if __name__ == "__main__":
    main()
