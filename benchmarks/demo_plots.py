"""Synthetic benchmark fixture: a fake server standing in for live infra.

The reference's pattern for "test the whole metrics/plot/verdict pipeline
offline" (generate_demo_plots.py: TTFA jitter, RTF band, 10% stall
injection, per-iteration thermal drift). Our generator models the same
phenomena with original parameters; the analysis pipeline downstream is the
real one.

    python -m benchmarks.demo_plots --iterations 12 --out demo_out
"""

from __future__ import annotations

import argparse
import random
import sys
from typing import List

from benchmarks import metrics as M
from benchmarks import plots
from benchmarks.metrics import ChunkEvent, RunResult

from tts_inference_tpu import protocol


def synth_result(
    rng: random.Random,
    iteration: int,
    *,
    ttfa_mean_ms: float = 800.0,
    ttfa_jitter_ms: float = 150.0,
    rtf_range=(0.95, 1.25),
    chunk_ms: float = 2 * protocol.FRAME_MS,   # ~171 ms cadence: normal gaps
    n_chunks: int = 12,                        # stay under the stall gate

    stall_prob: float = 0.10,
    drift_per_iter: float = 0.005,
) -> RunResult:
    """One synthetic iteration: chunk cadence ≈ chunk_ms/RTF with jitter,
    occasional stalls (+100–300 ms), and multiplicative drift per iteration."""
    drift = 1.0 + drift_per_iter * iteration
    rtf = rng.uniform(*rtf_range) / drift
    ttfa = max(100.0, rng.gauss(ttfa_mean_ms * drift, ttfa_jitter_ms))
    events: List[ChunkEvent] = []
    t = ttfa
    size = int(chunk_ms / 1000 * protocol.SAMPLE_RATE) * 2
    for c in range(1, n_chunks + 1):
        gap = 0.0
        if c > 1:
            gap = max(10.0, rng.gauss(chunk_ms / rtf, chunk_ms * 0.15))
            if rng.random() < stall_prob:
                gap += rng.uniform(100.0, 300.0)
            t += gap
        events.append(ChunkEvent(chunk_id=c, arrival_ms=t,
                                 size_bytes=size, gap_ms=gap))
    res = RunResult(
        prompt_id=f"synthetic_{iteration + 1}",
        prompt_text="<synthetic>", text_length=100,
        client_ttfa_ms=ttfa,
        client_wall_ms=t + chunk_ms / rtf,
        total_chunks=n_chunks,
        total_bytes=size * n_chunks,
        chunk_events=events,
    )
    res.audio_duration_ms = n_chunks * chunk_ms
    res.server_ttfa_ms = ttfa - rng.uniform(50, 150)
    res.server_ttft_ms = rng.uniform(80, 200)
    res.server_rtf = rtf * rng.uniform(1.02, 1.1)
    res.tokens_per_sec = 7000.0 / chunk_ms * rtf
    return res


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args(argv)

    rng = random.Random(args.seed)
    results = [synth_result(rng, i) for i in range(args.iterations)]
    summary = M.summarize(results)
    plots.timeline_plot(results[0], args.out)
    plots.gap_analysis_plot(results, args.out)
    plots.sweep_analysis_plot(results, args.out)
    plots.per_prompt_breakdown_plot(results, args.out)
    print(plots.summary_text(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
