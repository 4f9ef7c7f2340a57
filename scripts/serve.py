"""Persistent serving loop: load once, generate per JSON-line request.

The reference is strictly one-process-per-generation (generate.py re-loads
every model each run — minutes of overhead per clip on its hardware). This
entry point keeps the process alive: weights stay resident in HBM, the
lru-cached jitted denoise loops (pipelines/denoise.py) are reused whenever
a request repeats a (pipeline config, mesh) combination, and XLA
compilations amortize across the session — so steady-state latency is the
on-chip generation time alone.

Protocol: one JSON object per line on stdin (or --requests FILE), one JSON
response per line on stdout:

    {"prompt": "a red fox", "output": "/tmp/fox.mp4", "seed": 3}
    -> {"status": "ok", "output": "/tmp/fox.mp4", "seconds": 10.4, "id": 0}

Request fields override the CLI defaults given at launch: prompt,
negative_prompt, output, seed, height, width, num_frames,
num_inference_steps, cfg_scale, stg_scale, sampler, pipeline, fps, audio
(bool). Model/parallelism flags (checkpoint, --tp-devices, ...) are fixed
at launch — they define the resident configuration.

Example:
    python scripts/serve.py --checkpoint ckpt.safetensors --gemma-dir g/ \
        --pp-stages 2 --tp-devices 2 < requests.jsonl

With --http PORT the same requests arrive as `POST /generate` JSON bodies
(responses are the same JSON objects; request-validation errors come back
as HTTP 400, generation/server faults as 500, so load balancers classify
them correctly) and `GET /healthz` answers liveness probes; generations
serialize behind one lock since the resident configuration owns the
accelerator. --http-host widens the bind address beyond loopback;
--request-timeout bounds how long a POST blocks (504 on expiry — the
in-flight generation still runs to completion and later requests queue
behind it, because a jitted TPU program cannot be preempted mid-flight).
"""

import argparse
import copy
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import generate

# Per-request overridable fields (everything else is resident config).
REQUEST_FIELDS = {
    "prompt": str,
    "negative_prompt": str,
    "output": str,
    "seed": int,
    "height": int,
    "width": int,
    "num_frames": int,
    "num_inference_steps": int,
    "cfg_scale": float,
    "stg_scale": float,
    "sampler": str,
    "pipeline": str,
    "fps": float,
    "audio": bool,
    "tile_size": int,
    "skip_vae": bool,
}


def _positive_float(s: str) -> float:
    """argparse type for --request-timeout: 0 must be rejected, not
    silently treated as 'no timeout' (the falsy-check footgun)."""
    v = float(s)
    if v <= 0:
        raise argparse.ArgumentTypeError(
            f"must be > 0 (got {s}); omit the flag to disable the timeout"
        )
    return v


def build_parser():
    p = argparse.ArgumentParser(
        description="ltx2-tpu serving loop (JSON lines in, JSON lines out)",
        parents=[generate.build_parser()],
        add_help=False,
        conflict_handler="resolve",
    )
    p.add_argument("--requests", type=str, default="-",
                   help="requests file (JSON object per line); '-' = stdin")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve HTTP instead of stdin: POST /generate with "
                        "the same JSON request body (one generation at a "
                        "time — the accelerator is serialized behind a "
                        "lock), GET /healthz for liveness. Port 0 picks a "
                        "free port (logged at startup)")
    p.add_argument("--http-host", type=str, default="127.0.0.1",
                   help="bind address for --http (default loopback; set "
                        "0.0.0.0 to accept remote clients / load balancers)")
    p.add_argument("--request-timeout", type=_positive_float, default=None,
                   metavar="SEC",
                   help="HTTP only: reply 504 if a request (including its "
                        "time queued behind the generation lock) exceeds "
                        "SEC. A timed-out request still QUEUED behind the "
                        "lock is cancelled; an in-flight generation is not "
                        "— jitted TPU programs are not preemptible — so "
                        "the accelerator stays busy until it finishes")
    p.add_argument("--warmup", action="store_true",
                   help="run one generation with the launch defaults before "
                        "accepting requests (absorbs the first-compile cost)")
    p.add_argument("--warmup-shapes", type=str, default=None,
                   help="comma-separated HxWxF shapes to compile-ahead at "
                        "startup (e.g. '512x768x57,512x768x121'); with "
                        "--token-bucket, warming one shape per bucket makes "
                        "EVERY shape in those buckets a zero-compile hit")
    return p


def apply_request(base_args, request: dict):
    args = copy.copy(base_args)
    for key, value in request.items():
        if key not in REQUEST_FIELDS:
            raise ValueError(
                f"unknown request field {key!r} (allowed: "
                f"{sorted(REQUEST_FIELDS)})"
            )
        field_type = REQUEST_FIELDS[key]
        if field_type is bool:
            # bool("false") is True — reject anything but a JSON boolean
            # rather than silently inverting the caller's intent.
            if not isinstance(value, bool):
                raise ValueError(
                    f"field {key!r} must be a JSON boolean, got {value!r}"
                )
            setattr(args, key, value)
        else:
            setattr(args, key, field_type(value))
    # Audio models are resident only when the SERVER was launched with
    # --audio (setup() decided what to load); a per-request flip would
    # silently produce silent clips or hit a missing AV branch.
    if args.audio and not base_args.audio:
        raise ValueError(
            "request asks for audio but the server was launched without "
            "--audio (audio models are not resident); restart with --audio"
        )
    if args.pipeline == "a2vid" and base_args.pipeline != "a2vid" and not base_args.audio:
        raise ValueError(
            "a2vid needs the audio models resident; launch with --audio"
        )
    # Same %64 round-up the CLI applies at launch (advisor r3: a request
    # flipping pipeline=two-stage over a non-%64 resident resolution died
    # in TwoStageCFGConfig instead of rounding).
    return generate._round_two_stage_geometry(args)


def _actual_outputs(requested: str) -> list:
    """Resolve what was actually written: the mp4 when ffmpeg existed,
    otherwise the CLI's fallbacks (gif + frames npz, or the latent npz)."""
    import os

    base = requested.rsplit(".", 1)[0]
    candidates = [
        requested, base + ".avi", base + ".gif", base + "_frames.npz",
        base + "_latent.npz", base + ".wav",
    ]
    return [c for c in dict.fromkeys(candidates) if os.path.exists(c)]


def main(argv=None):
    # Same normalization generate.main applies: reference-flag aliases
    # (--fp8/--fp32/--model-variant/...), default-checkpoint resolution.
    # Without it a serve launch silently ignores those flags (e.g.
    # --model-variant without --checkpoint would serve placeholder weights).
    args = generate._apply_reference_compat(build_parser().parse_args(argv))

    from ltx2_tpu.utils.profiling import log

    t0 = time.perf_counter()
    models, ledger = generate.setup(args)
    log.info("serve: models resident in %.1f s", time.perf_counter() - t0)

    if args.warmup:
        import copy as copy_mod
        import os
        import tempfile

        # Throwaway artifacts: never touch the launch --output path.
        wa = copy_mod.copy(args)
        wa.output = tempfile.mktemp(suffix=".mp4", prefix="warmup_")
        t0 = time.perf_counter()
        generate.execute_request(wa, models, ledger)
        for artifact in _actual_outputs(wa.output):
            os.unlink(artifact)
        log.info("serve: warmup generation in %.1f s", time.perf_counter() - t0)

    if args.warmup_shapes:
        import copy as copy_mod
        import tempfile

        for shape in args.warmup_shapes.split(","):
            h, w, f = (int(v) for v in shape.strip().split("x"))
            wa = copy_mod.copy(args)
            wa.height, wa.width, wa.num_frames = h, w, f
            wa.output = tempfile.mktemp(suffix=".mp4", prefix="warmup_")
            t0 = time.perf_counter()
            generate.execute_request(wa, models, ledger)
            for artifact in _actual_outputs(wa.output):
                import os

                os.unlink(artifact)
            log.info("serve: warmed %dx%dx%d in %.1f s",
                     h, w, f, time.perf_counter() - t0)

    if args.http is not None:
        serve_http(args, models, ledger)
        return

    stream = sys.stdin if args.requests == "-" else open(args.requests)
    req_id = 0  # counts REQUESTS (comments/blank lines don't consume ids)
    for line in stream:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        try:
            request = json.loads(line)
            response = handle_request(args, models, ledger, request, req_id)
        except Exception as exc:  # noqa: BLE001 — a bad line must not kill the server
            response = {
                "status": "error", "id": req_id,
                "error": f"{type(exc).__name__}: {exc}", "seconds": 0.0,
            }
        req_id += 1
        print(json.dumps(response), flush=True)


def handle_request(args, models, ledger, request: dict, req_id: int) -> dict:
    """One generation: request dict in, response dict out (never raises —
    the error response IS the contract for both the line and HTTP fronts).

    Errors carry a "kind": "bad_request" when the REQUEST was invalid
    (apply_request validation — the caller's fault) vs "server" when the
    generation itself failed (missing weights, device OOM/abort, compile
    errors). The HTTP front maps these to 400 vs 500 so load balancers
    classify faults correctly (advisor r3)."""
    t0 = time.perf_counter()
    try:
        req_args = apply_request(args, request)
    except Exception as exc:  # noqa: BLE001 — a bad request must not kill the server
        return {
            "status": "error",
            "kind": "bad_request",
            "id": req_id,
            "error": f"{type(exc).__name__}: {exc}",
            "seconds": round(time.perf_counter() - t0, 2),
        }
    try:
        generate.execute_request(req_args, models, ledger)
        return {
            "status": "ok",
            "id": req_id,
            "output": req_args.output,
            "artifacts": _actual_outputs(req_args.output),
            "seconds": round(time.perf_counter() - t0, 2),
        }
    except Exception as exc:  # noqa: BLE001 — a device fault must not kill residency
        return {
            "status": "error",
            "kind": "server",
            "id": req_id,
            "error": f"{type(exc).__name__}: {exc}",
            "seconds": round(time.perf_counter() - t0, 2),
        }


def make_http_server(args, models, ledger):
    """ThreadingHTTPServer on args.http (0 = ephemeral): POST /generate with
    the same JSON body as the line protocol, GET /healthz. Generations are
    serialized behind one lock — a single resident model configuration owns
    the accelerator; concurrent POSTs queue rather than interleave."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    gen_lock = threading.Lock()
    counter = {"id": 0}

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"status": "error", "error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path != "/generate":
                self._reply(404, {"status": "error", "error": "not found"})
                return
            try:
                # Content-Length is mandatory: a chunked or length-less
                # POST would read as b"" -> {} and silently launch a full
                # generation with launch defaults (advisor r3).
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._reply(411, {
                        "status": "error",
                        "kind": "bad_request",
                        "error": "POST /generate requires a positive "
                                 "Content-Length (chunked bodies are not "
                                 "supported)",
                    })
                    return
                request = json.loads(self.rfile.read(length))
                if not isinstance(request, dict):
                    raise ValueError("request body must be a JSON object")
            except Exception as exc:  # noqa: BLE001
                self._reply(400, {
                    "status": "error",
                    "kind": "bad_request",
                    "error": f"{type(exc).__name__}: {exc}",
                })
                return

            def generate_locked(abandoned=None):
                with gen_lock:
                    # A request whose client already got 504 while QUEUED
                    # behind the lock is cancelled here instead of burning
                    # a full generation nobody will collect. Only an
                    # already-running jitted program is uncancellable.
                    if abandoned is not None and abandoned.is_set():
                        return None
                    req_id = counter["id"]
                    counter["id"] += 1
                    return handle_request(args, models, ledger, request, req_id)

            timeout = getattr(args, "request_timeout", None)
            if timeout is not None:
                import queue

                box = queue.Queue(maxsize=1)
                abandoned = threading.Event()
                worker = threading.Thread(
                    target=lambda: box.put(generate_locked(abandoned)),
                    daemon=True,
                )
                worker.start()
                try:
                    response = box.get(timeout=timeout)
                except queue.Empty:
                    abandoned.set()
                    self._reply(504, {
                        "status": "error",
                        "kind": "timeout",
                        "error": f"generation exceeded --request-timeout "
                                 f"{timeout}s (an in-flight generation "
                                 f"runs to completion; a still-queued one "
                                 f"is cancelled)",
                    })
                    return
            else:
                response = generate_locked()
            if response["status"] == "ok":
                code = 200
            else:
                code = 400 if response.get("kind") == "bad_request" else 500
            self._reply(code, response)

        def log_message(self, fmt, *fargs):  # route to the framework logger
            from ltx2_tpu.utils.profiling import log

            log.info("serve http: " + fmt, *fargs)

    host = getattr(args, "http_host", "127.0.0.1")
    return ThreadingHTTPServer((host, args.http), Handler)


def serve_http(args, models, ledger):
    from ltx2_tpu.utils.profiling import log

    server = make_http_server(args, models, ledger)
    log.info("serve: HTTP on http://%s:%d (POST /generate, "
             "GET /healthz)", server.server_address[0],
             server.server_address[1])
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
