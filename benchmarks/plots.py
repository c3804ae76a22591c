"""Matplotlib analysis plots for benchmark runs.

Produces the reference suite's artifact set (SURVEY.md §5.5:
`sweep_analysis.png`, `gap_analysis.png`, `per_prompt_breakdown.png`, the
4-panel timeline) as first-party implementations. Headless (Agg).
"""

from __future__ import annotations

import os
from typing import List

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from benchmarks.metrics import STALL_GAP_MS, RunResult  # noqa: E402


def _save(fig, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def timeline_plot(result: RunResult, out_dir: str,
                  name: str = "timeline.png") -> str:
    """4-panel per-iteration view: arrivals, gaps, cumulative audio vs wall
    clock (realtime frontier), chunk sizes."""
    ev = result.chunk_events
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0][0]
    ax.scatter([e.arrival_ms / 1000 for e in ev], [e.chunk_id for e in ev], s=14)
    ax.axvline(result.client_ttfa_ms / 1000, color="tab:green", ls="--",
               label=f"TTFA {result.client_ttfa_ms:.0f} ms")
    ax.set(xlabel="time (s)", ylabel="chunk #", title="Chunk arrival timeline")
    ax.legend()

    ax = axes[0][1]
    gaps = [e.gap_ms for e in ev[1:]]
    ax.bar(range(2, len(ev) + 1), gaps)
    ax.axhline(STALL_GAP_MS, color="tab:red", ls="--", label="stall threshold")
    ax.set(xlabel="chunk #", ylabel="gap (ms)", title="Inter-chunk gaps")
    ax.legend()

    ax = axes[1][0]
    cum_audio, t = [], []
    total = 0.0
    for e in ev:
        total += e.duration_ms
        cum_audio.append(total / 1000)
        t.append(e.arrival_ms / 1000)
    ax.plot(t, cum_audio, marker="o", ms=3, label="audio received")
    lim = max(t[-1] if t else 1.0, (cum_audio[-1] if cum_audio else 1.0))
    ax.plot([0, lim], [0, lim], color="gray", ls=":", label="realtime frontier")
    ax.set(xlabel="wall time (s)", ylabel="audio (s)",
           title=f"Realtime margin (RTF {result.rtf:.2f}×)")
    ax.legend()

    ax = axes[1][1]
    ax.plot([e.chunk_id for e in ev], [e.size_bytes / 1024 for e in ev],
            marker="s", ms=3)
    ax.set(xlabel="chunk #", ylabel="size (KiB)", title="Chunk sizes")
    fig.suptitle(f"{result.prompt_id} — {result.text_length} chars")
    return _save(fig, out_dir, name)


def gap_analysis_plot(results: List[RunResult], out_dir: str,
                      name: str = "gap_analysis.png") -> str:
    """Histogram + CDF + stalls per iteration + gap-vs-time drift."""
    gaps = [g for r in results for g in r.gaps_ms]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    ax = axes[0][0]
    if gaps:
        ax.hist(gaps, bins=30)
    ax.axvline(STALL_GAP_MS, color="tab:red", ls="--")
    ax.set(xlabel="gap (ms)", ylabel="count", title="Gap histogram")

    ax = axes[0][1]
    if gaps:
        xs = sorted(gaps)
        ax.plot(xs, [i / len(xs) for i in range(1, len(xs) + 1)])
    ax.axvline(STALL_GAP_MS, color="tab:red", ls="--")
    ax.set(xlabel="gap (ms)", ylabel="CDF", title="Gap CDF")

    ax = axes[1][0]
    ax.bar(range(1, len(results) + 1), [r.stalls for r in results])
    ax.set(xlabel="iteration", ylabel="stalls (gap>200 ms)",
           title="Stalls per iteration")

    ax = axes[1][1]
    ax.plot(range(1, len(results) + 1), [r.mean_gap_ms for r in results],
            marker="o", label="mean gap")
    ax.plot(range(1, len(results) + 1), [r.max_gap_ms for r in results],
            marker="^", label="max gap")
    ax.set(xlabel="iteration", ylabel="gap (ms)", title="Gap drift")
    ax.legend()
    return _save(fig, out_dir, name)


def sweep_analysis_plot(results: List[RunResult], out_dir: str,
                        name: str = "sweep_analysis.png") -> str:
    """TTFA/RTF/duration/gap vs text length (the length-sweep headline)."""
    oks = [r for r in results if r.ok and not r.is_cold_start]
    xs = [r.text_length for r in oks]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    panels = [
        ("client TTFA (ms)", [r.client_ttfa_ms for r in oks]),
        ("RTF (×)", [r.rtf for r in oks]),
        ("audio duration (s)", [r.audio_duration_ms / 1000 for r in oks]),
        ("max gap (ms)", [r.max_gap_ms for r in oks]),
    ]
    for ax, (label, ys) in zip(axes.flat, panels):
        ax.scatter(xs, ys)
        ax.set(xlabel="text length (chars)", ylabel=label, title=label)
    fig.suptitle("Length sweep")
    return _save(fig, out_dir, name)


def per_prompt_breakdown_plot(results: List[RunResult], out_dir: str,
                              name: str = "per_prompt_breakdown.png") -> str:
    oks = [r for r in results if r.ok and not r.is_cold_start]
    labels = [r.prompt_id for r in oks]
    fig, axes = plt.subplots(3, 1, figsize=(max(8, len(oks) * 0.5), 10))
    panels = [
        ("TTFA (ms)", [r.client_ttfa_ms for r in oks]),
        ("RTF (×)", [r.rtf for r in oks]),
        ("stalls", [r.stalls for r in oks]),
    ]
    for ax, (label, ys) in zip(axes, panels):
        ax.bar(range(len(oks)), ys)
        ax.set_xticks(range(len(oks)))
        ax.set_xticklabels(labels, rotation=60, ha="right", fontsize=7)
        ax.set_ylabel(label)
    return _save(fig, out_dir, name)


def summary_text(summary: dict) -> str:
    """Human-readable verdict block (reference prints this at the end)."""
    lines = [
        "=" * 60,
        f"iterations: {summary['iterations']}  "
        f"succeeded: {summary['succeeded']}",
        f"TTFA ms: mean {summary['ttfa_ms']['mean']:.0f}  "
        f"p95 {summary['ttfa_ms']['p95']:.0f}",
        f"RTF: mean {summary['rtf']['mean']:.2f}  min {summary['rtf']['min']:.2f}",
        f"max gap ms: worst {summary['max_gap_ms']['max']:.0f}  "
        f"jitter mean {summary['jitter_ms']['mean']:.0f}",
        f"stalls: {summary['stalls_total']}",
        f"drift: rtf {summary['drift']['rtf_drift_pct']:+.1f}%  "
        f"gap {summary['drift']['gap_drift_pct']:+.1f}%",
        f"VERDICT: {summary['verdict']}",
        "=" * 60,
    ]
    if "cold_vs_warm_ratio" in summary:
        lines.insert(-2, f"cold/warm TTFA ratio: "
                         f"{summary['cold_vs_warm_ratio']:.2f}×")
    return "\n".join(lines)
