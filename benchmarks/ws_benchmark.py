"""WebSocket streaming benchmark CLI (TTFA / RTF / gap / stall / drift).

The first-party counterpart of the reference's benchmark_with_wandb.py:
N iterations against a /ws/tts server, per-chunk timing, verdict gates
(GOOD: RTF≥1.0 ∧ max gap<300 ms; ACCEPTABLE: RTF≥0.8 ∧ <500 ms), timeline +
gap plots, optional W&B (offline JSON otherwise).

    python -m benchmarks.ws_benchmark --url ws://localhost:8000/ws/tts \
        --iterations 5 --save-audio --out bench_out
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

from benchmarks import metrics as M
from benchmarks import plots
from benchmarks.prompts import PERF_PROMPTS
from benchmarks.wandb_compat import RunLogger
from benchmarks.ws_client import run_single


async def run_benchmark(args) -> dict:
    results = []
    text = args.text or PERF_PROMPTS["medium"]
    extra = json.loads(args.extra_request) if args.extra_request else None
    for i in range(args.iterations):
        save = (
            os.path.join(args.out, f"benchmark_iter_{i + 1}.wav")
            if args.save_audio else None
        )
        r = await run_single(
            args.url, text,
            prompt_id=f"iter_{i + 1}",
            voice=args.voice,
            frames_per_chunk=args.frames_per_chunk,
            max_tokens=args.max_tokens,
            save_audio_to=save,
            extra_request=extra,
        )
        results.append(r)
        status = "ok" if r.ok else f"ERROR {r.error}"
        print(
            f"iter {i + 1}/{args.iterations}: {status} "
            f"ttfa {r.client_ttfa_ms:.0f}ms rtf {r.rtf:.2f} "
            f"maxgap {r.max_gap_ms:.0f}ms chunks {r.total_chunks}",
            flush=True,
        )

    summary = M.summarize(results)
    logger = RunLogger(args.wandb_project, name="ws_benchmark",
                       out_dir=args.out,
                       config={"url": args.url, "iterations": args.iterations})
    for i, r in enumerate(results):
        logger.log({
            "client_ttfa_ms": r.client_ttfa_ms, "rtf": r.rtf,
            "max_gap_ms": r.max_gap_ms, "jitter_ms": r.jitter_ms,
            "stalls": r.stalls, "server_ttfa_ms": r.server_ttfa_ms,
        }, step=i)
    logger.summary = {
        "verdict": summary["verdict"],
        "ttfa_mean_ms": summary["ttfa_ms"]["mean"],
        "rtf_mean": summary["rtf"]["mean"],
        "worst_gap_ms": summary["max_gap_ms"]["max"],
    }
    oks = [r for r in results if r.ok]
    if oks:
        logger.log_image(
            "timeline", plots.timeline_plot(oks[-1], args.out)
        )
        logger.log_image(
            "gap_analysis", plots.gap_analysis_plot(oks, args.out)
        )
    logger.finish()
    print(plots.summary_text(summary))
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", required=True, help="ws(s)://…/ws/tts")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--text", default=None)
    ap.add_argument("--voice", default="tara")
    ap.add_argument("--frames-per-chunk", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--save-audio", action="store_true")
    ap.add_argument("--out", default="bench_out")
    ap.add_argument("--wandb-project", default="tts-tpu-benchmark")
    ap.add_argument("--extra-request", default=None,
                    help='extra JSON merged into the WS request, e.g. '
                         '\'{"force_speech": true, "audio_only": true}\'')
    args = ap.parse_args(argv)
    summary = asyncio.run(run_benchmark(args))
    return 0 if summary["succeeded"] else 1


if __name__ == "__main__":
    sys.exit(main())
