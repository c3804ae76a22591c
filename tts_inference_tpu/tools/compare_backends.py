"""Backend A/B parity harness: jitted engine vs eager reference twin.

Counterpart of helpers/compare_snac.py (same prompt through two backends,
compare token counts / timing / audio stats, save WAVs :424-505) and
helpers/debug_tokens.py (greedy token-by-token diff with first-mismatch
localization :197-238). Our two backends are the production jitted engine
(scan decode, on-device sampling) and a plain eager per-step loop over the
same weights — the "eager twin" (SURVEY.md §2.2).

    python -m tts_inference_tpu.tools.compare_backends --tiny --cpu \
        --text "parity check" --max-tokens 48
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List, Sequence

import numpy as np


def eager_greedy(
    params, model_cfg, prompt_ids: Sequence[int], max_tokens: int,
    eos_id: int, logits_base: int = 0,
) -> List[int]:
    """Plain per-step argmax loop — no scan, no sampler, no engine.

    ``logits_base`` mirrors the engine's sliced-head setting
    (EngineConfig.sliced_head, protocol.HEAD_SLICE_BASE) so the twin argmaxes
    over the same candidate rows as the production decode path.
    """
    import jax.numpy as jnp

    from tts_inference_tpu.models import llama

    cache = llama.init_kv_cache(
        model_cfg, 1, len(prompt_ids) + max_tokens + 8
    )
    logits, cache = llama.prefill(
        params, model_cfg,
        jnp.asarray([list(prompt_ids)], jnp.int32),
        jnp.asarray([len(prompt_ids)], jnp.int32),
        cache, logits_base=logits_base,
    )
    out: List[int] = []
    tok = (logits_base + jnp.argmax(logits, -1)).astype(jnp.int32)
    for _ in range(max_tokens):
        out.append(int(tok[0]))
        if out[-1] == eos_id:
            break
        logits, cache = llama.decode_one(
            params, model_cfg, tok, cache, logits_base=logits_base
        )
        tok = (logits_base + jnp.argmax(logits, -1)).astype(jnp.int32)
    return out


def first_mismatch(a: Sequence[int], b: Sequence[int]) -> int:
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i
    return -1 if len(a) == len(b) else min(len(a), len(b))


def compare(runtime, text: str, voice: str, max_tokens: int) -> Dict:
    from tts_inference_tpu.config import SamplingConfig

    prompt = runtime.pipeline.build_prompt(text, voice)
    eng = runtime.engine

    t0 = time.perf_counter()
    res = eng.generate(
        prompt,
        SamplingConfig(greedy=True, max_tokens=max_tokens,
                       repetition_penalty=1.0),
    )
    engine_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    eager = eager_greedy(
        eng.core.params, eng.core.model_cfg, prompt, max_tokens, eng.eos_id,
        logits_base=eng.core.logits_base,
    )
    eager_s = time.perf_counter() - t0

    mismatch = first_mismatch(res.token_ids, eager)
    return {
        "prompt_tokens": len(prompt),
        "engine": {
            "tokens": len(res.token_ids),
            "time_s": round(engine_s, 3),
            "tokens_per_sec": round(len(res.token_ids) / engine_s, 1),
        },
        "eager": {
            "tokens": len(eager),
            "time_s": round(eager_s, 3),
            "tokens_per_sec": round(len(eager) / eager_s, 1),
        },
        "match": mismatch == -1,
        "first_mismatch": mismatch,
        "engine_head": res.token_ids[:10],
        "eager_head": eager[:10],
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="parity check")
    ap.add_argument("--voice", default="tara")
    ap.add_argument("--max-tokens", type=int, default=48)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model-path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tts_inference_tpu.config import Config, tiny_config
    from tts_inference_tpu.runtime import Runtime

    rt = Runtime.create(
        tiny_config() if args.tiny else Config(),
        model_path=args.model_path, seed=args.seed, warmup=False,
    )
    report = compare(rt, args.text, args.voice, args.max_tokens)
    print(json.dumps(report, indent=2))
    return 0 if report["match"] else 1


if __name__ == "__main__":
    sys.exit(main())
