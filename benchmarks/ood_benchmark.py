"""Out-of-distribution prompt benchmark with protocol-structure validation.

Counterpart of the reference's `run_ood_benchmark`
(vllm_inference/inference_engines/sglang_inference.py:195-250): run a set
of OOD prompts through the engine, validate the output's structure (the
reference regex-validates Orpheus tags; we validate the speech protocol:
SOS gating, frame-offset invariants, EOS termination), and report timing.

    python -m benchmarks.ood_benchmark --tiny --cpu --max-tokens 35
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List

from tts_inference_tpu import protocol as P

# 10 OOD prompts (original; Hindi + English, unusual domains for TTS)
OOD_PROMPTS: List[str] = [
    "क्वांटम कंप्यूटर क्यूबिट्स का उपयोग करके गणना करते हैं।",
    "The mitochondria is the powerhouse of the cell.",
    "शेयर बाज़ार में आज तीन प्रतिशत की गिरावट दर्ज की गई।",
    "Seventeen multiplied by twenty-three equals three hundred ninety-one.",
    "हिमालय की सबसे ऊँची चोटी का नाम बताइए।",
    "Error 404: the requested resource was not found on this server.",
    "आर्टिफ़िशियल इंटेलिजेंस नैतिकता पर एक संगोष्ठी आयोजित होगी।",
    "The recipe calls for two cups of flour and a pinch of saffron.",
    "न्यायालय ने मामले की अगली सुनवाई अगले महीने तय की।",
    "Checkmate in four moves, beginning with the knight sacrifice.",
]


def validate_output(token_ids: List[int]) -> dict:
    """Structural validation of a generation (the tag-regex analog)."""
    codes = P.extract_audio_codes(token_ids)
    complete_frames = len(codes) // P.FRAME_SIZE
    violations = P.validate_frame_offsets(codes[: complete_frames * P.FRAME_SIZE])
    return {
        "tokens": len(token_ids),
        "audio_codes": len(codes),
        "complete_frames": complete_frames,
        "offset_violations": len(violations),
        "terminated": bool(token_ids and token_ids[-1] == P.TOKEN_EOS),
        "valid": len(violations) == 0,
    }


def run(runtime, max_tokens: int, force_speech: bool, audio_only: bool) -> dict:
    from tts_inference_tpu.config import SamplingConfig

    results = []
    for i, text in enumerate(OOD_PROMPTS):
        prompt = runtime.pipeline.build_prompt(
            text, "tara", force_speech=force_speech
        )
        t0 = time.perf_counter()
        res = runtime.engine.generate(prompt, SamplingConfig(
            max_tokens=max_tokens, seed=1000 + i,
            token_range=(
                (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)
                if audio_only else None
            ),
        ))
        wall = time.perf_counter() - t0
        v = validate_output(res.token_ids)
        v.update({
            "prompt_id": i, "chars": len(text),
            "wall_s": round(wall, 3),
            "tokens_per_sec": round(len(res.token_ids) / wall, 1),
        })
        results.append(v)
    n_valid = sum(1 for r in results if r["valid"])
    return {
        "prompts": len(results),
        "valid": n_valid,
        "valid_pct": round(100.0 * n_valid / len(results), 1),
        "mean_tokens_per_sec": round(
            sum(r["tokens_per_sec"] for r in results) / len(results), 1
        ),
        "results": results,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model-path")
    ap.add_argument("--max-tokens", type=int, default=70)
    ap.add_argument("--force-speech", action="store_true", default=True)
    ap.add_argument("--audio-only", action="store_true", default=True)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tts_inference_tpu.config import Config, tiny_config
    from tts_inference_tpu.runtime import Runtime

    rt = Runtime.create(
        tiny_config() if args.tiny else Config(),
        model_path=args.model_path, warmup=False,
    )
    report = run(rt, args.max_tokens, args.force_speech, args.audio_only)
    print(json.dumps(report, indent=2))
    return 0 if report["valid"] == report["prompts"] else 1


if __name__ == "__main__":
    sys.exit(main())
