"""Benchmark metric primitives: chunk events, per-run results, verdicts.

First-party re-design of the reference's measurement vocabulary
(`plot_metrics/benchmark_with_wandb.py:37-75` dataclasses; stats at
`hindi_finetuned/benchmark.py:275-284`; verdict thresholds at
`benchmark_with_wandb.py:575-586`; drift analysis at `:547-567`;
stall definition gap>200 ms at `:533-544`).
"""

from __future__ import annotations

import dataclasses
import statistics
from typing import Dict, List, Optional

from tts_inference_tpu import protocol

STALL_GAP_MS = 200.0          # gap above this counts as a stall
GOOD_RTF, GOOD_GAP_MS = 1.0, 300.0
ACCEPTABLE_RTF, ACCEPTABLE_GAP_MS = 0.8, 500.0


@dataclasses.dataclass
class ChunkEvent:
    """One audio chunk arrival as observed by the client."""

    chunk_id: int
    arrival_ms: float           # since request send
    size_bytes: int
    gap_ms: float               # since previous chunk (0 for first)

    @property
    def duration_ms(self) -> float:
        return (self.size_bytes // 2) / protocol.SAMPLE_RATE * 1000.0


@dataclasses.dataclass
class RunResult:
    """One benchmark iteration (client view + server-reported metrics)."""

    prompt_id: str = ""
    prompt_text: str = ""
    text_length: int = 0
    is_cold_start: bool = False

    client_ttfa_ms: float = 0.0
    client_wall_ms: float = 0.0
    audio_duration_ms: float = 0.0
    total_chunks: int = 0
    total_bytes: int = 0
    chunk_events: List[ChunkEvent] = dataclasses.field(default_factory=list)

    server_ttft_ms: Optional[float] = None
    server_ttfa_ms: Optional[float] = None
    server_rtf: Optional[float] = None
    tokens_per_sec: Optional[float] = None

    error: Optional[str] = None

    # -- derived ------------------------------------------------------------

    @property
    def ok(self) -> bool:
        return self.error is None and self.total_chunks > 0

    @property
    def rtf(self) -> float:
        if not self.client_wall_ms:
            return 0.0
        return self.audio_duration_ms / self.client_wall_ms

    @property
    def gaps_ms(self) -> List[float]:
        return [e.gap_ms for e in self.chunk_events[1:]]

    @property
    def max_gap_ms(self) -> float:
        return max(self.gaps_ms, default=0.0)

    @property
    def mean_gap_ms(self) -> float:
        g = self.gaps_ms
        return sum(g) / len(g) if g else 0.0

    @property
    def jitter_ms(self) -> float:
        g = self.gaps_ms
        return statistics.pstdev(g) if len(g) > 1 else 0.0

    @property
    def stalls(self) -> int:
        return sum(1 for g in self.gaps_ms if g > STALL_GAP_MS)


def calc_stats(values: List[float]) -> Dict[str, float]:
    """mean/std/min/max/p50/p95 (the reference's calc_stats contract)."""
    if not values:
        return {k: 0.0 for k in ("mean", "std", "min", "max", "p50", "p95")}
    xs = sorted(values)
    n = len(xs)

    def pct(p: float) -> float:
        idx = min(n - 1, max(0, round(p / 100.0 * (n - 1))))
        return xs[idx]

    return {
        "mean": sum(xs) / n,
        "std": statistics.pstdev(xs) if n > 1 else 0.0,
        "min": xs[0],
        "max": xs[-1],
        "p50": pct(50),
        "p95": pct(95),
    }


def verdict(results: List[RunResult]) -> str:
    """GOOD / ACCEPTABLE / NEEDS IMPROVEMENT, per the reference's gates:
    GOOD = RTF≥1.0 ∧ worst gap<300 ms; ACCEPTABLE = RTF≥0.8 ∧ <500 ms."""
    oks = [r for r in results if r.ok]
    if not oks:
        return "NEEDS IMPROVEMENT"
    mean_rtf = sum(r.rtf for r in oks) / len(oks)
    worst_gap = max((r.max_gap_ms for r in oks), default=0.0)
    if mean_rtf >= GOOD_RTF and worst_gap < GOOD_GAP_MS:
        return "GOOD"
    if mean_rtf >= ACCEPTABLE_RTF and worst_gap < ACCEPTABLE_GAP_MS:
        return "ACCEPTABLE"
    return "NEEDS IMPROVEMENT"


def drift_analysis(results: List[RunResult]) -> Dict[str, float]:
    """First-half vs second-half RTF/gap drift (thermal / degradation watch;
    warn thresholds 10% RTF, 20% gap — benchmark_with_wandb.py:561-567)."""
    oks = [r for r in results if r.ok]
    if len(oks) < 4:
        return {"rtf_drift_pct": 0.0, "gap_drift_pct": 0.0}
    half = len(oks) // 2
    a, b = oks[:half], oks[half:]

    def mean(vals):
        return sum(vals) / len(vals) if vals else 0.0

    rtf_a, rtf_b = mean([r.rtf for r in a]), mean([r.rtf for r in b])
    gap_a, gap_b = mean([r.mean_gap_ms for r in a]), mean([r.mean_gap_ms for r in b])
    return {
        "rtf_drift_pct": (rtf_b - rtf_a) / rtf_a * 100.0 if rtf_a else 0.0,
        "gap_drift_pct": (gap_b - gap_a) / gap_a * 100.0 if gap_a else 0.0,
    }


def summarize(results: List[RunResult]) -> Dict[str, object]:
    """Aggregate summary (the reference's W&B summary block)."""
    oks = [r for r in results if r.ok]
    cold = [r for r in oks if r.is_cold_start]
    warm = [r for r in oks if not r.is_cold_start]
    s: Dict[str, object] = {
        "iterations": len(results),
        "succeeded": len(oks),
        "ttfa_ms": calc_stats([r.client_ttfa_ms for r in oks]),
        "rtf": calc_stats([r.rtf for r in oks]),
        "max_gap_ms": calc_stats([r.max_gap_ms for r in oks]),
        "jitter_ms": calc_stats([r.jitter_ms for r in oks]),
        "stalls_total": sum(r.stalls for r in oks),
        "verdict": verdict(oks),
        "drift": drift_analysis(oks),
    }
    if [r.server_ttfa_ms for r in oks if r.server_ttfa_ms is not None]:
        s["server_ttfa_ms"] = calc_stats(
            [r.server_ttfa_ms for r in oks if r.server_ttfa_ms is not None]
        )
        s["server_ttft_ms"] = calc_stats(
            [r.server_ttft_ms for r in oks if r.server_ttft_ms is not None]
        )
    if cold and warm:
        cold_ttfa = calc_stats([r.client_ttfa_ms for r in cold])["mean"]
        warm_ttfa = calc_stats([r.client_ttfa_ms for r in warm])["mean"]
        s["cold_vs_warm_ratio"] = (
            cold_ttfa / warm_ttfa if warm_ttfa else 0.0
        )
    return s
