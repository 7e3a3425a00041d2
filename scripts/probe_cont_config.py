"""Probe: ContinuousEngine flood capacity vs (prefill_chunk, horizon).

Round-5 finding: on a healthy tunnel the gathered engine floods ~61
answers/s while the continuous engine caps near ~21-30 — the slot engine
pays a tunnel round trip per prefill CHUNK and per HORIZON of decode steps,
where the gathered engine pays ~2 per 16-answer batch. Larger chunks and
horizons trade refill granularity (queue latency) for fewer round trips.
This probe measures the flood capacity across the grid so the sweep runs at
the throughput-optimal point and SERVING.md documents the tradeoff.

Run: python scripts/probe_cont_config.py [--duration 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from bench_serving import build_engine, flood_capacity, log  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--flood-n", type=int, default=128)
    args = p.parse_args()

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")

    grid = [(4, 8), (8, 8), (8, 16), (16, 16), (16, 20)]
    rows = []
    for chunk, horizon in grid:
        work = f"/tmp/probe_cc_{chunk}_{horizon}"
        t0 = time.perf_counter()
        eng, ids = build_engine(
            work, args.slots, continuous=True, horizon=horizon,
            prefill_chunk=chunk,
        )
        build_s = time.perf_counter() - t0
        # warm flood then the measured flood (first pays residual compiles)
        flood_capacity(eng, ids, n=32)
        cap = flood_capacity(eng, ids, n=args.flood_n)
        s = eng.stats()
        rows.append({
            "prefill_chunk": chunk, "horizon": horizon,
            "flood_answers_per_sec": round(cap, 1),
            "decode_dispatches": s.get("decode_dispatches"),
            "slot_occupancy": s.get("slot_occupancy"),
            "build_s": round(build_s, 1),
        })
        log(f"chunk={chunk} horizon={horizon}: {cap:.1f} answers/s "
            f"(occupancy {s.get('slot_occupancy')})")
        eng.stop()
    print(json.dumps({"bench": "cont_config_grid", "slots": args.slots,
                      "rows": rows}, indent=1))


if __name__ == "__main__":
    sys.exit(main())
