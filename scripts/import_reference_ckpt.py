"""Convert a REFERENCE checkpoint (`torch.save` .pth from
hieunghia-pat/phoneme-VQA, `/root/reference/core/executor/base_executor.py:100-124`)
into this framework's orbax checkpoint, so trained reference models serve
and evaluate here unchanged.

    python scripts/import_reference_ckpt.py \
        --config-file configs/latr.yaml \
        --ckpt /path/to/best_ckp.pth [--name best] [--allow-partial]

The converted checkpoint carries params only (step/epoch/best_score from the
.pth; no optimizer state — torch Adam moments are not meaningful to optax):
it is for `--mode eval`, `--mode predict`, and `serve.py`. Starting `--mode
train` on top of one resumes params from a fresh optimizer (the graceful
path in `BaseExecutor._maybe_resume`).

Families with a pluggable answer tokenizer (Customized*) must point
`vocab_save_path` at the reference's trained `bpevocab.json` so the decoder
head sizes line up.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from phoneme_vqa_tpu import registry_setup  # noqa: F401
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.models.hf_import import (
    ImportReport,
    import_reference_state_dict,
)
from phoneme_vqa_tpu.utils.logger import get_logger
from phoneme_vqa_tpu.utils.registry import EXECUTORS

log = get_logger(__name__)


def load_reference_ckpt(path: str, unsafe: bool = False) -> dict:
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        # weights_only=False unpickles arbitrary code from the .pth — only do
        # that when the user explicitly opted in, and say why it was needed.
        if not unsafe:
            raise SystemExit(
                f"Safe load (weights_only=True) failed for {path}: {e}\n"
                "If you trust this checkpoint, re-run with --unsafe-load to "
                "fall back to full unpickling (executes code from the file)."
            )
        log.warning(
            f"weights_only=True load failed ({e}); falling back to UNSAFE "
            f"torch.load(weights_only=False) on {path} per --unsafe-load"
        )
        return torch.load(path, map_location="cpu", weights_only=False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt", required=True, help="reference .pth checkpoint")
    p.add_argument("--name", default="best", choices=["best", "last"])
    p.add_argument("--allow-partial", action="store_true",
                   help="write even if some tensors failed to map")
    p.add_argument("--unsafe-load", action="store_true",
                   help="permit torch.load(weights_only=False) fallback, "
                        "which can execute code embedded in the .pth")
    args = p.parse_args()

    config = get_config(args.config_file)
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")

    ckpt = load_reference_ckpt(args.ckpt, unsafe=args.unsafe_load)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    report = ImportReport()
    # the imported state dict overwrites the tree, but unmatched leaves keep
    # the template's values — materialize the deferred serve-mode init
    params = jax.tree.map(np.asarray, ex._ensure_params())
    params = import_reference_state_dict(params, sd, report=report)
    report.log_summary("reference checkpoint")
    if report.failed and not args.allow_partial:
        report.raise_if_failed("reference checkpoint")

    tree = {
        "params": params,
        "step": np.asarray(int(ckpt.get("step", 0)), np.int64),
        "epoch": np.asarray(int(ckpt.get("epoch", 0)), np.int64),
        "best_score": np.asarray(float(ckpt.get("best_score", 0.0)), np.float32),
    }
    ex.ckpt.save(args.name, tree, block=True)
    out_dir = os.path.join(ex.ckpt.save_path, f"{args.name}_ckp")
    log.info(
        f"Converted {args.ckpt} -> {out_dir} "
        f"({len(report.mapped)} tensors mapped)"
    )


if __name__ == "__main__":
    main()
