"""Online serving CLI: dynamic-batched VQA answering over stdin/stdout.

The reference stops at one-shot ``predict`` jobs
(`/root/reference/core/executor/base_executor.py:143-165`); this serves the
same models online. Requests are JSON lines on stdin::

    {"image_id": 3, "question": "tên cửa hàng là gì?"}        (optional "id")

and answers stream back as JSON lines on stdout::

    {"id": 0, "answer": "phúc long"}

Concurrent requests are dynamically batched into one fixed-shape compiled
decode (see `phoneme_vqa_tpu/serving/engine.py`); responses are written in
completion order, tagged with the request "id" (or input line number).

Usage:
    python serve.py --config-file configs/latr.yaml [--ckpt best|last|none]
                    [--batch-size 8] [--max-wait-ms 5] [--max-length 20]
"""

import argparse
import json
import os
import sys
import threading

import jax

# Honor JAX_PLATFORMS even when a sitecustomize force-selected a backend
# (same shim as run.py): lets `JAX_PLATFORMS=cpu` drive the server off-TPU.
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from phoneme_vqa_tpu import registry_setup  # noqa: F401  (fills registries)
from phoneme_vqa_tpu.config import get_config
from phoneme_vqa_tpu.serving import ServingEngine
from phoneme_vqa_tpu.utils.logger import get_logger
from phoneme_vqa_tpu.utils.registry import EXECUTORS

log = get_logger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--ckpt", default="best", choices=["best", "last", "none"],
                   help="checkpoint to serve ('none' = random init, for tests)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--buckets", default=None, metavar="N,N,...",
                   help="extra decode-batch shapes compiled at warmup (e.g. "
                        "'1,4'); each gathered batch decodes at the smallest "
                        "bucket that fits, cutting lone-request latency "
                        "under light load. 'auto' = powers of 4 up to "
                        "--batch-size")
    p.add_argument("--max-length", type=int, default=None,
                   help="decode length cap (default: config.max_predict_length)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve HTTP on PORT instead of stdin/stdout "
                        "(POST /answer, GET /stats, GET /healthz)")
    p.add_argument("--max-queue", type=int, default=-1,
                   help=">0 bounds pending requests (backpressure; values "
                        "below 2x batch starve the batcher — warned). "
                        "-1 (default) auto-derives 4x --batch-size; "
                        "0 = unbounded")
    p.add_argument("--cache-size", type=int, default=0,
                   help=">0 memoizes repeated (image_id, question) answers (LRU)")
    p.add_argument("--deadline-s", type=float, default=0, metavar="SECONDS",
                   help=">0 expires requests still queued after this many "
                        "seconds (load shedding; per-request deadline_s "
                        "overrides)")
    p.add_argument("--adapter", action="append", default=[],
                   metavar="NAME=CKPT_DIR",
                   help="serve a LoRA adapter from a composite checkpoint "
                        "directory under NAME (repeatable); requests select "
                        'it with an "adapter" field. One base model, many '
                        "finetunes — a switch merges on the fly, no model "
                        "copies")
    p.add_argument("--confidence", action="store_true",
                   help="include a confidence field (geometric-mean emitted-"
                        "token probability) in every answer")
    p.add_argument("--access-log", default=None, metavar="FILE",
                   help="append one JSON line per request: status (ok/"
                        "cached/expired/error), submit->resolution "
                        "latency_ms, decode bucket, adapter, answer length. "
                        "Question TEXT is never written (only its length), "
                        "so the file is safe for ordinary log pipelines")
    p.add_argument("--aot", default=None, metavar="DIR",
                   help="AOT executable store: load the serve executables "
                        "from DIR at startup (zero-compile restart — no "
                        "trace/lower/compile, straight to answering); when "
                        "DIR is missing or was packed for a different "
                        "environment, compile normally and (re)pack DIR for "
                        "the next restart")
    p.add_argument("--prime", action="store_true",
                   help="warm up (compile the serve executable into the "
                        "persistent compilation cache) and exit 0 — for "
                        "baking cache-primed container images")
    p.add_argument("--reload-every", type=float, default=0, metavar="SECONDS",
                   help=">0 polls the served checkpoint's mtime and "
                        "hot-reloads new weights with no downtime (a trainer "
                        "can keep writing checkpoints next to a live server)")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching: slot-based decode with "
                        "step-boundary refill (all nine families, including "
                        "the phoneme triple stream; --batch-size becomes the "
                        "slot count). Incompatible with --adapter/--buckets/"
                        "--aot for now")
    # 20/16 defaults from the round-5 config grid (docs/
    # probe_cont_config_r5.json): at 16 slots they beat 8/4 on BOTH flood
    # throughput (37.3 vs 21.5 answers/s; fewer dispatch round trips
    # through the ~28 ms-overhead tunnel) and low-load p50 (508 vs 581 ms)
    p.add_argument("--horizon", type=int, default=20,
                   help="continuous mode: decode steps per device dispatch "
                        "(refill granularity)")
    p.add_argument("--prefill-chunk", type=int, default=16,
                   help="continuous mode: rows per compiled prefill")
    p.add_argument("--spec", type=int, default=None, metavar="K",
                   help="continuous mode: per-slot speculative decoding — "
                        "each slot verifies a K-token prompt-lookup draft "
                        "window per device step (identical answers; faster "
                        "when answers copy OCR/question text). Defaults to "
                        "the config's SPEC_DECODE; 0 disables")
    return p.parse_args()


def build_engine(args):
    config = get_config(args.config_file)
    try:  # persistent XLA compilation cache: restarts skip the warmup compile
        cache_dir = config.get("COMPILE_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    # serve mode: tokenizers + feature stores + model only — no QA CSVs
    # read, no eval dataset featurized at startup
    ex = EXECUTORS.get(config.EXECUTOR)(config, mode="serve")
    if args.ckpt != "none":
        ex._load_trained_checkpoint(args.ckpt)
        ex._place_state()
    ocr_df, obj_df = ex.serve_frames
    max_len = args.max_length or int(config.get("max_predict_length", 20))
    adapters = {}
    for spec in args.adapter:
        name, _, path = spec.partition("=")
        if not name or not path:
            raise SystemExit(f"--adapter expects NAME=CKPT_DIR, got {spec!r}")
        adapters[name] = load_adapter(path)
        log.info(f"## adapter {name!r} loaded from {path}")
    access_log = None
    if args.access_log:
        sink = open(args.access_log, "a", buffering=1, encoding="utf-8")
        sink_lock = threading.Lock()

        def access_log(rec, _f=sink, _lk=sink_lock):
            with _lk:  # records come from worker AND submit threads
                _f.write(json.dumps(rec, ensure_ascii=False) + "\n")

        log.info(f"## access log -> {args.access_log}")
    if args.continuous:
        from phoneme_vqa_tpu.serving import ContinuousEngine

        unsupported = [
            flag for flag, on in (
                ("--adapter", bool(adapters)), ("--buckets", args.buckets),
                ("--aot", args.aot),
            ) if on
        ]
        if unsupported:
            raise SystemExit(
                f"--continuous does not support {', '.join(unsupported)} yet"
            )
        spec_k = (
            args.spec if args.spec is not None
            else int(config.get("SPEC_DECODE", 0) or 0)
        )
        return ContinuousEngine(
            ex, ocr_df, obj_df,
            num_slots=args.batch_size,
            prefill_chunk=args.prefill_chunk,
            horizon=args.horizon,
            max_answer_length=max_len,
            max_queue=args.max_queue,
            default_deadline_s=args.deadline_s,
            access_log=access_log,
            confidence=args.confidence,
            cache_size=args.cache_size,
            spec_k=spec_k,
        )
    loaded = []
    if args.aot:
        from phoneme_vqa_tpu.serving import aot

        loaded = aot.load(ex, args.aot)
    engine = ServingEngine(
        ex, ocr_df, obj_df,
        batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms,
        max_answer_length=max_len,
        max_queue=args.max_queue,
        cache_size=args.cache_size,
        confidence=args.confidence,
        default_deadline_s=args.deadline_s,
        adapters=adapters or None,
        buckets=parse_buckets(args.buckets, args.batch_size),
        access_log=access_log,
    )
    if args.aot:
        # (re)pack when the store doesn't cover this server's executables
        # (first start, env change, or different buckets/length/confidence)
        have = {
            (e["batch_size"], e["max_length"], bool(e["with_scores"]))
            for e in loaded
        }
        want = {(b, max_len, args.confidence) for b in engine.buckets}
        if not want <= have:
            aot.pack(engine, args.aot)
    return engine


def parse_buckets(spec, batch_size: int):
    if not spec:
        return None
    if spec == "auto":  # 1, 4, 16, ... below batch_size
        return [b for b in (4**i for i in range(8)) if b < batch_size]
    try:
        return [int(b) for b in spec.split(",") if b.strip()]
    except ValueError:
        raise SystemExit(f"--buckets expects N,N,... or 'auto', got {spec!r}")


def load_adapter(ckpt_dir: str) -> dict:
    """{"lora", "scale"} from a composite LoRA checkpoint directory (a
    LORA_RANK training run's SAVE_PATH; best_ckp preferred, then last_ckp)."""
    from phoneme_vqa_tpu.train import lora as lora_mod
    from phoneme_vqa_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(ckpt_dir)
    name = "best" if ckpt.exists("best") else "last"
    raw = ckpt.restore_raw(name)
    params = raw["params"]
    if not lora_mod.is_composite(params):
        raise SystemExit(
            f"{ckpt_dir}/{name}_ckp is not a LoRA composite checkpoint "
            "(train it with LORA_RANK to produce adapters)"
        )
    return {
        "lora": params["lora"],
        "scale": float(raw.get("lora_scale", 1.0)),
    }


def make_http_server(engine, port: int):
    """HTTP front-end over the engine (stdlib, thread-per-request — each
    handler blocks on its future while the engine batches across them):
    POST /answer {"image_id", "question"} -> {"answer"}; GET /stats; GET
    /healthz."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Server(ThreadingHTTPServer):
        # graceful shutdown: server_close() must wait for in-flight handler
        # threads (which may be blocked on engine futures) so their
        # responses are written before the process exits
        daemon_threads = False
        block_on_close = True

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # route access logs to our logger
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                reason = getattr(engine, "unhealthy_reason", None)
                if reason:  # stall watchdog fired: dead device behind us
                    self._send(503, {"ok": False, "reason": reason})
                else:
                    self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, engine.stats())
            elif self.path == "/metrics":
                body = engine.prometheus_metrics().encode("utf-8")
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/reload":
                # hot-swap weights: {"ckpt": "best"|"last"} (default "best")
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n)) if n else {}
                    loadtype = str(body.get("ckpt", "best"))
                    if loadtype not in ("best", "last"):
                        return self._send(
                            400, {"error": "ckpt must be 'best' or 'last'"}
                        )
                    return self._send(200, engine.reload(loadtype))
                except FileNotFoundError as e:
                    return self._send(404, {"error": str(e)})
                except Exception as e:
                    return self._send(500, {"error": str(e)})
            if self.path != "/answer":
                return self._send(404, {"error": "not found"})
            from concurrent.futures import TimeoutError as FutureTimeout

            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
            except Exception as e:
                return self._send(400, {"error": f"bad request body: {e}"})
            if not isinstance(req, dict) or "image_id" not in req or "question" not in req:
                return self._send(
                    400, {"error": "image_id and question fields required"}
                )
            if not isinstance(req["image_id"], (str, int, float)):
                return self._send(
                    400, {"error": "image_id must be a string or number"}
                )
            if not isinstance(req.get("deadline_s", 0), (int, float)):
                return self._send(400, {"error": "deadline_s must be a number"})
            if req.get("adapter") is not None and not isinstance(
                req["adapter"], str
            ):
                return self._send(400, {"error": "adapter must be a string"})
            try:
                ans = engine.submit(
                    req["image_id"], str(req["question"]),
                    deadline_s=req.get("deadline_s"),
                    adapter=req.get("adapter"),
                ).result(timeout=120)
                # confidence mode resolves to {"answer", "confidence"}
                self._send(200, ans if isinstance(ans, dict) else {"answer": ans})
            except KeyError as e:  # unknown image
                self._send(404, {"error": str(e)})
            except RuntimeError as e:  # queue full / engine stopped
                self._send(503, {"error": str(e)})
            except FutureTimeout as e:  # expired deadline or a wedged decode
                self._send(504, {"error": str(e) or "decode timed out"})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return _Server(("", port), Handler)


def start_reload_watcher(engine, loadtype: str, every_s: float):
    """Polls the served checkpoint's mtime every ``every_s`` seconds and
    hot-reloads when a trainer writes a new one (orbax's atomic rename means
    a changed mtime is always a complete checkpoint). Daemon thread; dies
    with the process."""
    import time as _time

    ckpt = engine.executor.ckpt
    last = {"mtime": ckpt.mtime(loadtype)}

    def watch():
        while not engine._stopped:
            _time.sleep(every_s)
            try:
                m = ckpt.mtime(loadtype)
                if m is not None and m != last["mtime"]:
                    engine.reload(loadtype)
                    last["mtime"] = m
            except Exception as e:  # keep watching; a reload can be retried
                log.warning(f"reload watcher: {e!r}")

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    return t


def main():
    import time

    args = parse_args()
    t0 = time.monotonic()
    engine = build_engine(args)
    log.info(f"## ready to answer in {time.monotonic() - t0:.1f} s")
    if args.reload_every > 0 and args.ckpt != "none":
        start_reload_watcher(engine, args.ckpt, args.reload_every)
    if args.prime:
        # warmup already compiled the serve executable into the persistent
        # cache (and packed the --aot store) during build_engine
        engine.stop()
        log.info(
            "## primed (serve executable compiled"
            + (f", AOT store at {args.aot}" if args.aot else "")
            + "); exiting"
        )
        return
    if args.http is not None:
        import signal

        srv = make_http_server(engine, args.http)
        # SIGTERM/SIGINT: stop accepting, drain in-flight batches, exit 0 —
        # the shutdown a process manager expects
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, lambda *_: threading.Thread(
                target=srv.shutdown, daemon=True
            ).start())
        log.info(
            f"## HTTP SERVING on :{srv.server_port} "
            "(POST /answer, GET /stats, GET /healthz)"
        )
        try:
            srv.serve_forever()
        finally:
            srv.server_close()  # waits for in-flight handler threads
            engine.stop()
            log.info(f"## serving stats: {engine.stats()}")
        return
    out_lock = threading.Lock()
    # in-flight only: done futures discard themselves, so a long-lived
    # server's memory stays flat no matter how many requests stream through
    pending = set()
    log.info("## SERVING (ctrl-d to drain and exit) ...")

    def respond(req_id, fut):
        try:
            res = fut.result()
            # confidence mode resolves to {"answer", "confidence"}
            obj = {"id": req_id, **res} if isinstance(res, dict) else \
                  {"id": req_id, "answer": res}
            line = json.dumps(obj, ensure_ascii=False)
        except Exception as e:
            line = json.dumps({"id": req_id, "error": str(e)}, ensure_ascii=False)
        with out_lock:
            print(line, flush=True)

    for i, raw in enumerate(sys.stdin):
        raw = raw.strip()
        if not raw:
            continue
        req = None
        try:
            req = json.loads(raw)
            fut = engine.submit(
                req["image_id"], str(req["question"]),
                deadline_s=req.get("deadline_s") if isinstance(req, dict) else None,
                adapter=req.get("adapter") if isinstance(req, dict) else None,
            )
        except Exception as e:
            rid = req.get("id", i) if isinstance(req, dict) else i
            respond(rid, _failed(e))
            continue
        req_id = req.get("id", i)
        pending.add(fut)
        fut.add_done_callback(
            lambda f, rid=req_id: (respond(rid, f), pending.discard(f))
        )

    for fut in list(pending):  # drain before exit
        try:
            fut.result()
        except Exception:
            pass
    engine.stop()
    log.info(f"## serving stats: {engine.stats()}")


def _failed(e):
    from concurrent.futures import Future

    f = Future()
    f.set_exception(e)
    return f


if __name__ == "__main__":
    main()
