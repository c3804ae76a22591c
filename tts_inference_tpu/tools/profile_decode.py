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
    ap.add_argument("--paged-kv", action="store_true")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--kv-int4", action="store_true")
    ap.add_argument("--prefill-len", type=int, default=12,
                    help="prompt length per slot — sets the cache depth "
                         "(and thus the attention window) the profiled "
                         "decode runs at")
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
    if args.paged_kv or args.kv_int8 or args.kv_int4:
        import dataclasses

        if not args.tiny:
            # the serving geometry bench.py uses (max_seq 2176, not the
            # default 4608) — a 64-slot dense-pool profile at the default
            # geometry exceeds one chip's HBM
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, max_input_len=128, max_output_len=2048,
            ))
        max_seq = cfg.engine.max_input_len + cfg.engine.max_output_len
        blk = next(b for b in (128, 64, 32, 16) if max_seq % b == 0)
        cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
            cfg.engine, paged_kv=args.paged_kv,
            kv_cache_int8=args.kv_int8, kv_cache_int4=args.kv_int4,
            kv_block_size=blk if args.paged_kv else cfg.engine.kv_block_size,
            # the profiler prefills every slot up front (no capacity-gated
            # admission), so the pool must hold full-depth slots — unlike
            # serving, which oversubscribes batch * max_seq / 2
            kv_pool_tokens=(args.batch + 1) * max_seq
            if args.paged_kv else cfg.engine.kv_pool_tokens,
        ))
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg.model)
    if args.quantize:
        from tts_inference_tpu.models.quant import quantize_llama_params

        params = quantize_llama_params(params, bits=args.weight_bits)
    core = EngineCore(params, cfg.model, cfg.engine, batch_size=args.batch)
    sp = S.SamplingParams.from_config(SamplingConfig(), args.batch)
    tok = core.prefill_slots(
        [[1] * args.prefill_len] * args.batch,
        list(range(args.batch)), sp,
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
