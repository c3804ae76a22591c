"""Headline benchmark: warm streaming TTS on the flagship Orpheus-3B path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures warm streaming RTF (audio seconds produced per wall second) for a
single stream: prompt → jitted prefill → frame-cadence decode → lookahead
windowed vocoder → PCM chunks, exactly the serving hot path. Weights are
random (no checkpoint assets in this environment) — decode/vocoder cost does
not depend on weight values; sampling is constrained to the audio-token
range so the pipeline produces frames at the true serving cadence.

Baseline: the reference's warm streaming RTF on A100-80GB, sweep mean 1.42×
(spec.md:62, BASELINE.md) — vs_baseline = value / 1.42.

Flags: --smoke (tiny model, CPU-safe), --tokens N, --json-extra.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


BASELINE_RTF = 1.42  # reference warm streaming sweep mean (spec.md:62)


def run(smoke: bool = False, tokens: int = 420, extra: bool = False) -> dict:
    import numpy as np

    from tts_inference_tpu import protocol as P
    from tts_inference_tpu.config import (
        Config, EngineConfig, SamplingConfig, StreamConfig, tiny_config,
    )
    from tts_inference_tpu.runtime import Runtime

    if smoke:
        cfg = tiny_config()
    else:
        cfg = Config(
            engine=EngineConfig(
                max_input_len=128,
                max_output_len=2048,
                max_batch_size=1,
                prefill_buckets=(128,),
            ),
        )
    rt = Runtime.create(cfg, warmup=False)

    sampling = SamplingConfig(
        max_tokens=tokens,
        seed=0,
        token_range=(P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB),
    )
    scfg = StreamConfig(frames_per_chunk=5, lookahead_frames=5,
                        left_context_frames=16)
    text = "The quick brown fox jumps over the lazy dog near the river bank."

    def one_pass():
        t0 = time.perf_counter()
        n_samples = 0
        ttfa = None
        gaps = []
        last = None
        for chunk in rt.pipeline.stream(
            text, "tara", sampling, scfg, force_speech=True
        ):
            now = time.perf_counter()
            if ttfa is None:
                ttfa = (now - t0) * 1000.0
            if last is not None:
                gaps.append((now - last) * 1000.0)
            last = now
            n_samples += chunk.samples
        wall = time.perf_counter() - t0
        m = rt.pipeline.last_metrics
        return {
            "wall_s": wall,
            "audio_s": n_samples / P.SAMPLE_RATE,
            "rtf": (n_samples / P.SAMPLE_RATE) / wall,
            "ttfa_ms": ttfa or 0.0,
            "ttft_ms": m.ttft_ms,
            "tokens_per_sec": m.tokens_per_sec,
            "max_gap_ms": max(gaps) if gaps else 0.0,
            "mean_gap_ms": float(np.mean(gaps)) if gaps else 0.0,
        }

    one_pass()          # cold: compiles everything
    warm = one_pass()   # warm: the measured run

    result = {
        "metric": "warm_streaming_rtf",
        "value": round(warm["rtf"], 4),
        "unit": "x_realtime",
        "vs_baseline": round(warm["rtf"] / BASELINE_RTF, 4),
    }
    if extra:
        result["detail"] = {k: round(v, 2) for k, v in warm.items()}
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model (CPU-safe sanity run)")
    ap.add_argument("--tokens", type=int, default=420)
    ap.add_argument("--json-extra", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run(args.smoke, args.tokens, args.json_extra)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
