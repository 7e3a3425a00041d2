"""Serving cold-start benchmark: cold vs cache-primed vs AOT restart.

Measures the REAL `serve.py --prime` process at LaTr-base scale (B=32 serve
executable — the shape whose compile costs ~1.5 min on this chip,
docs/DESIGN.md "Compilation model") in four restart regimes:

    cold         fresh compilation cache, no AOT store   (first-ever start)
    cold+pack    fresh cache, --aot DIR                  (first start that
                                                          also bakes the store)
    cache        persistent compilation cache primed     (trace+lower+cache hit)
    aot          --aot DIR with a packed store           (zero-compile restart)

Each regime is a fresh subprocess (honest process restart: imports, host
init, param H2D all re-paid); the number reported per regime is the child's
total wall-clock plus the parsed "## ready to answer in X s" line serve.py
logs once the engine answers. Writes a JSON summary and (with --out) a
markdown table for docs/SERVING.md.

Run: python scripts/bench_aot_start.py [--batch 32] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DIMS = dict(
    t5_vocab_size=36096, d_model=768, d_kv=64, num_heads=12, d_ff=3072,
    num_encoder_layers=12, num_t5_decoder_layers=12,
    vit_image_size=224, vit_patch_size=16, vit_hidden_size=768,
    vit_num_layers=12, vit_num_heads=12, vit_mlp_dim=3072,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_serve(yaml_path: str, batch: int, aot_dir: str | None, name: str,
              work: str) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "serve.py"),
        "--config-file", yaml_path, "--ckpt", "none",
        "--batch-size", str(batch), "--prime",
    ]
    if aot_dir:
        cmd += ["--aot", aot_dir]
    pp = os.pathsep.join(filter(None, [REPO, os.environ.get("PYTHONPATH")]))
    env = dict(os.environ, PYTHONPATH=pp)
    t0 = time.perf_counter()
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=3600
    )
    wall = time.perf_counter() - t0
    out = r.stdout + r.stderr
    with open(os.path.join(work, f"{name}.log"), "w", encoding="utf-8") as f:
        f.write(out)
    if r.returncode != 0:
        log(out[-3000:])
        raise SystemExit(f"{name} failed rc={r.returncode}")
    m = re.search(r"## ready to answer in ([0-9.]+) s", out)
    ready = float(m.group(1)) if m else None
    aot_loaded = "AOT store loaded" in out
    log(f"{name}: total {wall:.1f}s, ready {ready}s, aot_loaded={aot_loaded}")
    return {
        "regime": name, "total_wall_s": round(wall, 1),
        "ready_s": ready, "aot_loaded": aot_loaded,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--work", default="/tmp/bench_aot_start")
    p.add_argument("--tiny", action="store_true",
                   help="tiny dims on CPU — plumbing self-test")
    p.add_argument("--out", default=None,
                   help="append the markdown table to this file")
    args = p.parse_args()

    from phoneme_vqa_tpu.data.synthetic import make_latr_fixture, tiny_latr_yaml

    os.makedirs(args.work, exist_ok=True)
    dims, hw = dict(BASE_DIMS), 224
    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
        dims, hw = {}, 32
    paths = make_latr_fixture(args.work, n_images=3, n_rows=8, image_hw=hw)
    aot_dir = os.path.join(args.work, "aot_store")

    def yaml_for(cache_tag: str) -> str:
        return tiny_latr_yaml(
            paths, os.path.join(args.work, "ck"),
            NUM_EPOCHS=1, SAVE=False,
            max_ocr_element=100, max_ocr_length=100, max_q_length=30,
            max_a_length=20, max_eval_length=20, max_predict_length=20,
            DTYPE="float32" if args.tiny else "bfloat16", NUMWORKERS=0,
            COMPILE_CACHE_DIR=os.path.join(args.work, f"cache_{cache_tag}"),
            **dims,
        )

    results = [
        # first-ever start: nothing cached anywhere
        run_serve(yaml_for("cold"), args.batch, None, "cold", args.work),
        # first start that also bakes the AOT store (pack cost on top)
        run_serve(yaml_for("pack"), args.batch, aot_dir, "cold+pack", args.work),
        # restart with ONLY the persistent compilation cache primed
        run_serve(yaml_for("pack"), args.batch, None, "cache", args.work),
        # restart from the AOT store: zero compiles, fresh compile cache
        run_serve(yaml_for("aotonly"), args.batch, aot_dir, "aot", args.work),
    ]
    if not results[-1]["aot_loaded"]:
        raise SystemExit("aot regime did not load the store — check logs")
    summary = {
        "batch": args.batch,
        "dims": "tiny-cpu" if args.tiny else "latr-base",
        "runs": results,
    }
    print(json.dumps(summary))
    if args.out:
        lines = [
            "",
            f"| restart regime | total wall (s) | ready-to-answer (s) |",
            "|---|---|---|",
        ]
        for r in results:
            lines.append(
                f"| {r['regime']} | {r['total_wall_s']} | {r['ready_s']} |"
            )
        with open(args.out, "a", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        log(f"table appended to {args.out}")


if __name__ == "__main__":
    main()
