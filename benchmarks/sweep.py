"""Comprehensive length-sweep benchmark (cold + warm phases).

The first-party counterpart of the reference's comprehensive_sweep.py:
Phase 1 cold-start ×N on a medium prompt, Phase 2 warm sweep over the
8-tier prompt corpus; per-prompt WAVs, sweep/gap/per-prompt plots, summary
incl. cold/warm TTFA ratio.

    python -m benchmarks.sweep --url ws://localhost:8000/ws/tts --out sweep_out
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

from benchmarks import metrics as M
from benchmarks import plots
from benchmarks.prompts import SWEEP_PROMPTS
from benchmarks.wandb_compat import RunLogger
from benchmarks.ws_client import run_single


async def run_sweep(args) -> dict:
    import json

    extra = json.loads(args.extra_request) if args.extra_request else None
    results = []

    print(f"Phase 1: cold start ×{args.cold_iterations}", flush=True)
    cold_text = dict(SWEEP_PROMPTS)["medium_1"]
    for i in range(args.cold_iterations):
        r = await run_single(
            args.url, cold_text, prompt_id=f"cold_{i + 1}",
            frames_per_chunk=args.frames_per_chunk,
            max_tokens=args.max_tokens, is_cold_start=True,
            extra_request=extra,
        )
        results.append(r)
        print(f"  cold {i + 1}: ttfa {r.client_ttfa_ms:.0f}ms "
              f"rtf {r.rtf:.2f} {'' if r.ok else r.error}", flush=True)

    print(f"Phase 2: warm sweep over {len(SWEEP_PROMPTS)} prompts", flush=True)
    for pid, text in SWEEP_PROMPTS:
        save = (os.path.join(args.out, f"sweep_{pid}.wav")
                if args.save_audio else None)
        r = await run_single(
            args.url, text, prompt_id=pid,
            frames_per_chunk=args.frames_per_chunk,
            max_tokens=args.max_tokens, save_audio_to=save,
            extra_request=extra,
        )
        results.append(r)
        print(f"  {pid} ({len(text)} ch): ttfa {r.client_ttfa_ms:.0f}ms "
              f"rtf {r.rtf:.2f} maxgap {r.max_gap_ms:.0f}ms "
              f"{'' if r.ok else r.error}", flush=True)

    summary = M.summarize(results)
    logger = RunLogger(args.wandb_project, name="comprehensive_sweep",
                       out_dir=args.out, config={"url": args.url})
    for i, r in enumerate(results):
        logger.log({
            "prompt_id": r.prompt_id, "text_length": r.text_length,
            "cold": r.is_cold_start, "client_ttfa_ms": r.client_ttfa_ms,
            "rtf": r.rtf, "max_gap_ms": r.max_gap_ms, "stalls": r.stalls,
        }, step=i)
    oks = [r for r in results if r.ok]
    if oks:
        logger.log_image("sweep", plots.sweep_analysis_plot(oks, args.out))
        logger.log_image("gaps", plots.gap_analysis_plot(oks, args.out))
        logger.log_image(
            "per_prompt", plots.per_prompt_breakdown_plot(oks, args.out)
        )
    logger.summary = {
        "verdict": summary["verdict"],
        "cold_vs_warm_ratio": summary.get("cold_vs_warm_ratio"),
        "ttfa_mean_ms": summary["ttfa_ms"]["mean"],
        "rtf_mean": summary["rtf"]["mean"],
    }
    logger.finish()
    print(plots.summary_text(summary))
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", required=True)
    ap.add_argument("--cold-iterations", type=int, default=3)
    ap.add_argument("--frames-per-chunk", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--save-audio", action="store_true")
    ap.add_argument("--out", default="sweep_out")
    ap.add_argument("--wandb-project", default="tts-tpu-benchmark")
    ap.add_argument("--extra-request", default=None)
    args = ap.parse_args(argv)
    summary = asyncio.run(run_sweep(args))
    return 0 if summary["succeeded"] else 1


if __name__ == "__main__":
    sys.exit(main())
