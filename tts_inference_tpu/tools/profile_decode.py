"""Decode-loop profiler: jax.profiler trace + per-op-kind aggregation.

The TPU analog of the reference's cuda-synchronize-fenced phase timing
(SURVEY.md §5.1), plus the device-op breakdown used to drive this repo's
decode optimizations (GQA einsum, scatter writes, KV windowing, int8).

    python -m tts_inference_tpu.tools.profile_decode --tiny --cpu --steps 14
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import tempfile
import time


def aggregate_trace(trace_dir: str, top: int = 15) -> list:
    """Parse a jax.profiler trace; return [(op_kind, total_ms, count)]."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    tot = collections.Counter()
    cnt = collections.Counter()
    for f in files:
        data = json.load(gzip.open(f))
        pid_names = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        for e in data.get("traceEvents", []):
            if (e.get("ph") == "X" and "dur" in e
                    and "TPU" in pid_names.get(e.get("pid"), "")):
                name = e["name"]
                if name.startswith(("jit_", "while")):
                    continue
                base = re.sub(r"[.\d]+$", "", name)
                tot[base] += e["dur"]
                cnt[base] += 1
    return [(k, v / 1000.0, cnt[k]) for k, v in tot.most_common(top)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--weight-bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--steps", type=int, default=21)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from tts_inference_tpu.config import Config, SamplingConfig, tiny_config
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.ops import sampling as S
    from tts_inference_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(None)
    cfg = tiny_config() if args.tiny else Config()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg.model)
    if args.quantize:
        from tts_inference_tpu.models.quant import quantize_llama_params

        params = quantize_llama_params(params, bits=args.weight_bits)
    core = EngineCore(params, cfg.model, cfg.engine, batch_size=args.batch)
    sp = S.SamplingParams.from_config(SamplingConfig(), args.batch)
    tok = core.prefill_slots(
        [[1] * 12] * args.batch, list(range(args.batch)), sp
    )
    act = np.ones(args.batch, bool)
    core.decode_steps(sp, tok, act, n=7)  # compile

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="tts_trace_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    n_done = 0
    while n_done < args.steps:
        toks, tok, act = core.decode_steps(sp, tok, act, n=7)
        n_done += 7
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    report = {
        "steps": n_done,
        "batch": args.batch,
        "ms_per_token": round(wall / n_done * 1000.0, 3),
        "tokens_per_sec": round(n_done / wall, 1),
        "aggregate_tokens_per_sec": round(args.batch * n_done / wall, 1),
        "trace_dir": trace_dir,
        "top_ops_ms": [
            {"op": k, "total_ms": round(ms, 2), "count": c}
            for k, ms, c in aggregate_trace(trace_dir)
        ],
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
