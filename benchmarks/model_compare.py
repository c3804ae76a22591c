"""Multi-checkpoint comparison benchmark.

Counterpart of the reference's 3-model comparison (`vllm_inference/
modal_benchmark.py:30-183`: base vs research-FT vs own-LoRA on 10 tagged
prompts, fanned out in parallel, W&B table). Here: any number of
checkpoints (HF dirs, orbax dirs, or `tiny:<seed>` specs) run over the
prompt set sequentially on one chip; per-model structure validation +
throughput; offline-W&B table artifact.

    python -m benchmarks.model_compare --cpu --models tiny:0 tiny:1 \
        --max-tokens 35 --out cmp_out
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from benchmarks.ood_benchmark import OOD_PROMPTS, validate_output
from benchmarks.wandb_compat import RunLogger


def load_model(spec: str, tiny_cfg, full_cfg):
    from tts_inference_tpu.runtime import Runtime

    if spec.startswith("tiny:"):
        return Runtime.create(tiny_cfg, seed=int(spec.split(":", 1)[1]),
                              warmup=False)
    return Runtime.create(full_cfg, model_path=spec, warmup=False)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", required=True,
                    help="checkpoint dirs or tiny:<seed> specs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=48)
    ap.add_argument("--prompts", type=int, default=5)
    ap.add_argument("--out", default="cmp_out")
    ap.add_argument("--wandb-project", default="tts-tpu-benchmark")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tts_inference_tpu import protocol as P
    from tts_inference_tpu.config import Config, SamplingConfig, tiny_config

    logger = RunLogger(args.wandb_project, name="model_compare",
                       out_dir=args.out, config={"models": args.models})
    table = []
    for spec in args.models:
        rt = load_model(spec, tiny_config(), Config())
        rows = []
        for i, text in enumerate(OOD_PROMPTS[: args.prompts]):
            prompt = rt.pipeline.build_prompt(text, "tara", force_speech=True)
            t0 = time.perf_counter()
            res = rt.engine.generate(prompt, SamplingConfig(
                max_tokens=args.max_tokens, seed=i,
                token_range=(P.TOKEN_AUDIO_BASE,
                             P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB),
            ))
            wall = time.perf_counter() - t0
            v = validate_output(res.token_ids)
            rows.append({**v, "wall_s": wall})
        summary = {
            "model": spec,
            "prompts": len(rows),
            "valid_pct": 100.0 * sum(r["valid"] for r in rows) / len(rows),
            "mean_frames": sum(r["complete_frames"] for r in rows) / len(rows),
            "mean_tokens_per_sec": sum(
                r["tokens"] / r["wall_s"] for r in rows
            ) / len(rows),
        }
        table.append(summary)
        logger.log(summary)
        print(json.dumps(summary))
    logger.summary = {"models": len(table)}
    logger.finish()
    print(json.dumps({"table": table}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
