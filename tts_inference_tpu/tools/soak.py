"""Scheduler soak test: sustained randomized churn with leak/drift gates.

The reference's long-run story is drift *warnings* in its benchmark client
(>10% RTF / >20% gap change between runs, benchmark_with_wandb.py:561-567)
plus the hard lesson that its engine core "dies unexpectedly mid-generation"
under sustained load (SURVEY.md §5.3). This harness drives the continuous-
batching scheduler under randomized concurrent load — mixed request lengths,
sampling configs, and mid-stream cancellations — and gates on:

- zero error events (unless injected),
- no slot leak (n_active == 0, vocode queue drained at the end),
- bounded host RSS growth (leaks in per-request state would show here),
- TTFA drift between the first and last quartile of completions.

Run:  python -m tts_inference_tpu.tools.soak --tiny --cpu --duration 20
"""

from __future__ import annotations

import argparse
import json
import random
import resource
import sys
import threading
import time
from typing import List


def run_soak(
    scheduler,
    *,
    duration_s: float = 20.0,
    warm_s: float = 5.0,
    target_streams: int = 4,
    max_tokens_range=(14, 70),
    cancel_rate: float = 0.1,
    seed: int = 0,
    drift_limit: float = 0.5,
    # host RSS growth cap. Late graph compiles (XLA host allocations) land
    # here too — real-model runs compile GBs of host-side artifacts for
    # shapes first reached mid-run, so size the cap for the model, not for
    # true per-request leaks (which the tiny CPU test bounds tightly).
    rss_limit_mb: float = 4096.0,
) -> dict:
    from tts_inference_tpu import protocol as P
    from tts_inference_tpu.config import SamplingConfig, StreamConfig
    from tts_inference_tpu.engine.scheduler import TTSRequest

    rng = random.Random(seed)
    audio_range = (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)
    scfg = StreamConfig(frames_per_chunk=2, lookahead_frames=3,
                        left_context_frames=4)

    results: List[dict] = []
    errors: List[str] = []
    lock = threading.Lock()

    # warm phase: compiles (graph shapes, vocode row/frame buckets, KV
    # windows) land here so the drift/RSS gates below measure
    # sustained-load behavior, not cold start. Mirrors the measured load:
    # target_streams CONCURRENT requests per round, short and long.
    if warm_s > 0:
        from tts_inference_tpu.config import SamplingConfig
        from tts_inference_tpu.engine.scheduler import TTSRequest as _R

        warm_dl = time.perf_counter() + warm_s
        round_i = 0
        while time.perf_counter() < warm_dl:
            mt = max_tokens_range[round_i % 2]
            batch = [
                _R(text=f"warm {round_i}-{j}", sampling=SamplingConfig(
                    max_tokens=mt, seed=j, token_range=audio_range),
                    stream_cfg=scfg, force_speech=True)
                for j in range(target_streams)
            ]
            ths = []
            for r in batch:
                scheduler.submit(r)
                t = threading.Thread(
                    target=lambda rr=r: [None for _ in
                                         rr.iter_chunks(timeout=120)],
                    daemon=True)
                t.start()
                ths.append(t)
            for t in ths:
                t.join(timeout=150)
            round_i += 1
        scheduler.drain_vocoder(timeout=60)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    def consume(req, cancelled):
        t0 = time.perf_counter()
        ttfa = None
        try:
            while True:
                kind, payload = req.events.get(timeout=120)
                if kind == "chunk" and ttfa is None:
                    ttfa = (time.perf_counter() - t0) * 1e3
                elif kind == "done":
                    with lock:
                        results.append({
                            "ttfa_ms": ttfa, "tokens": payload.tokens,
                            "cancelled": cancelled,
                        })
                    return
                elif kind == "error":
                    with lock:
                        errors.append(str(payload))
                    return
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"consumer timeout/crash: {e}")

    deadline = time.perf_counter() + duration_s
    threads: List[threading.Thread] = []
    submitted = 0
    while time.perf_counter() < deadline:
        live = sum(1 for t in threads if t.is_alive())
        if live >= target_streams:
            time.sleep(0.005)
            continue
        mt = rng.randint(*max_tokens_range)
        greedy = rng.random() < 0.2
        req = TTSRequest(
            text=f"soak {submitted}",
            sampling=SamplingConfig(
                max_tokens=mt, seed=submitted,
                greedy=greedy, repetition_penalty=1.0 if greedy else 1.1,
                token_range=audio_range,
                frame_protocol=rng.random() < 0.3,
            ),
            stream_cfg=scfg, force_speech=True, noise_seed=submitted,
        )
        cancel = rng.random() < cancel_rate
        scheduler.submit(req)
        if cancel:
            def canceller(r=req):
                time.sleep(rng.uniform(0.01, 0.3))
                r.cancel()
            threading.Thread(target=canceller, daemon=True).start()
        t = threading.Thread(target=consume, args=(req, cancel),
                             daemon=True)
        t.start()
        threads.append(t)
        submitted += 1
    for t in threads:
        t.join(timeout=180)
    scheduler.drain_vocoder(timeout=60)

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    done = [r for r in results if not r["cancelled"] and r["ttfa_ms"]]
    # drift: 2nd quartile vs 4th quartile of completions — the 1st quartile
    # is biased fast (the system starts empty; TTFA under load is higher by
    # design, which is load, not degradation)
    q = max(1, len(done) // 4)
    ref_q = [r["ttfa_ms"] for r in done[q: 2 * q]]
    last_q = [r["ttfa_ms"] for r in done[-q:]]
    drift = (
        (sum(last_q) / len(last_q)) / (sum(ref_q) / len(ref_q)) - 1.0
        if ref_q and last_q else 0.0
    )
    report = {
        "submitted": submitted,
        "completed": len(results),
        "errors": len(errors),
        "error_samples": errors[:3],
        "slots_active_at_end": scheduler.n_active,
        "vocode_pending_at_end": scheduler._vocode_pending,
        "rss_growth_mb": round(rss1 - rss0, 1),
        "ttfa_drift": round(drift, 3),
        "ok": (
            not errors
            and scheduler.n_active == 0
            and scheduler._vocode_pending == 0
            and len(results) == submitted
            # one-sided: getting FASTER over the run is not a failure
            and drift <= drift_limit
            and (rss1 - rss0) <= rss_limit_mb
        ),
    }
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--cancel-rate", type=float, default=0.1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import create_tiny_runtime

    if not args.tiny:
        print("only --tiny supported without checkpoints", file=sys.stderr)
        return 2
    rt = create_tiny_runtime(seed=0)
    sched = Scheduler(
        rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer
    )
    sched.start()
    try:
        report = run_soak(
            sched, duration_s=args.duration, target_streams=args.streams,
            cancel_rate=args.cancel_rate, seed=args.seed,
        )
    finally:
        sched.stop()
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
