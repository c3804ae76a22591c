"""Warm-lifecycle launcher: the reference's Modal warm-container pattern
(`@app.cls` + `@modal.enter` load, `scaledown_window`, auto-restart —
`vllm_inference/inference_engines/vllm_inference.py:28-56`) as a plain
process supervisor for a TPU VM:

    python -m deploy.launch --port 8000 -- --model-path … --multi-stream

Phases:
1. **warm build** (once, optional `--skip-build`): runs `cli aot-compile`
   with the same runtime flags so every serving graph lands in the
   persistent XLA cache and `build_info.json` is written — the analog of
   the reference's saved TRT engine + build metadata.
2. **serve**: spawns `cli serve`, waits for `GET /health` to go ready.
3. **watch**: polls /health every `--health-interval`; a crashed or
   unresponsive server is restarted with exponential backoff (the
   reference's engine-core crash lesson, SURVEY.md §5.3 — here the socket
   consumers get clean errors from the scheduler watchdog and the process
   comes back by itself).
4. **drain**: SIGTERM/SIGINT forwards to the server and waits up to
   `--drain-s` for in-flight requests before killing.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request


def http_ok(url: str, timeout: float = 2.0) -> bool:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status == 200
    except Exception:
        return False


class Launcher:
    def __init__(self, args, serve_args):
        self.args = args
        self.serve_args = serve_args
        self.proc: subprocess.Popen | None = None
        self.stopping = False
        self.restarts = 0

    # -- phases --------------------------------------------------------------

    def warm_build(self) -> None:
        cmd = [
            sys.executable, "-m", "tts_inference_tpu.cli", "aot-compile",
            "--build-info", self.args.build_info, *self.serve_args,
        ]
        print(f"[launch] warm build: {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, check=True)

    def spawn(self) -> None:
        cmd = [
            sys.executable, "-m", "tts_inference_tpu.cli", "serve",
            "--host", self.args.host, "--port", str(self.args.port),
            *self.serve_args,
        ]
        print(f"[launch] serve: {' '.join(cmd)}", flush=True)
        self.proc = subprocess.Popen(cmd)

    def wait_ready(self, timeout: float) -> bool:
        url = f"http://127.0.0.1:{self.args.port}/health"
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.proc is not None and self.proc.poll() is not None:
                return False
            if http_ok(url):
                print("[launch] ready", flush=True)
                return True
            time.sleep(0.5)
        return False

    def drain(self) -> None:
        if self.proc is None or self.proc.poll() is not None:
            return
        print(f"[launch] draining (≤{self.args.drain_s}s)…", flush=True)
        self.proc.send_signal(signal.SIGTERM)
        try:
            self.proc.wait(timeout=self.args.drain_s)
        except subprocess.TimeoutExpired:
            print("[launch] drain timeout — killing", flush=True)
            self.proc.kill()
            self.proc.wait()

    # -- supervision ----------------------------------------------------------

    def run(self) -> int:
        def on_term(signum, frame):
            self.stopping = True
            self.drain()

        signal.signal(signal.SIGTERM, on_term)
        signal.signal(signal.SIGINT, on_term)

        if not self.args.skip_build:
            self.warm_build()

        backoff = 1.0
        url = f"http://127.0.0.1:{self.args.port}/health"
        while not self.stopping:
            self.spawn()
            if not self.wait_ready(self.args.ready_timeout_s):
                if self.stopping:
                    break
                print("[launch] server failed to become ready", flush=True)
            else:
                backoff = 1.0
                misses = 0
                while not self.stopping:
                    time.sleep(self.args.health_interval)
                    if self.proc.poll() is not None:
                        print(f"[launch] server exited "
                              f"rc={self.proc.returncode}", flush=True)
                        break
                    if http_ok(url):
                        misses = 0
                    else:
                        misses += 1
                        if misses >= self.args.health_misses:
                            print("[launch] health check failing — "
                                  "restarting", flush=True)
                            self.drain()
                            break
            if self.stopping:
                break
            self.restarts += 1
            if (self.args.max_restarts is not None
                    and self.restarts > self.args.max_restarts):
                print("[launch] restart limit reached", flush=True)
                return 1
            print(f"[launch] restart #{self.restarts} in {backoff:.0f}s",
                  flush=True)
            time.sleep(backoff)
            backoff = min(backoff * 2, 60.0)
        self.drain()
        print(json.dumps({"restarts": self.restarts}), flush=True)
        return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="warm-lifecycle supervisor for the TTS server "
                    "(args after `--` pass through to cli serve/aot-compile)"
    )
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--build-info", default="build_info.json")
    ap.add_argument("--skip-build", action="store_true",
                    help="skip the aot-compile warm phase")
    ap.add_argument("--ready-timeout-s", type=float, default=1800.0,
                    help="first-boot graph compiles can take minutes")
    ap.add_argument("--health-interval", type=float, default=5.0)
    ap.add_argument("--health-misses", type=int, default=3)
    ap.add_argument("--drain-s", type=float, default=30.0)
    ap.add_argument("--max-restarts", type=int, default=None)
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        i = argv.index("--")
        own, serve_args = argv[:i], argv[i + 1:]
    else:
        own, serve_args = argv, []
    args = ap.parse_args(own)
    return Launcher(args, serve_args).run()


if __name__ == "__main__":
    os.environ.setdefault("PYTHONUNBUFFERED", "1")
    sys.exit(main())
