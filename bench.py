"""Headline benchmark. Prints ONE JSON line:
    {"metric", "value", "unit", "vs_baseline"}

Default mode: 8 concurrent streams through the continuous-batching
scheduler on one chip — the BASELINE.json north-star configuration ("RTF ≥5×
realtime per v5e chip at 8 concurrent streams"). value = aggregate RTF
(audio seconds produced per wall second across all streams, warm).

Baseline: the reference's warm streaming RTF, 1.42× on A100-80GB
(spec.md:62) — and the reference serializes requests behind a lock
(max_batch_size=1 engines, SURVEY.md §2.3), so its aggregate equals its
single-stream number. vs_baseline = value / 1.42.

Weights are random (no checkpoint assets in this environment); decode and
vocoder cost do not depend on weight values, and sampling is constrained to
the audio-token range so frames flow at the true serving cadence.

Modes: --mode single|concurrent ; --smoke (tiny, CPU-safe) ; --streams N ;
--tokens N ; --json-extra.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_RTF = 1.42  # reference warm streaming sweep mean (spec.md:62)


def build_runtime(smoke: bool, quantize: bool = False,
                  steps_per_call: int = 7, slots: int = 8,
                  kv_int8: bool = False, tp: int = 1, dp: int = 1,
                  kv_int4: bool = False,
                  prefix_cache: bool = False, paged_kv: bool = False,
                  kv_pool_tokens=None, pallas_attention: bool = False,
                  first_lookahead=None, max_output: int = 2048,
                  tokenizer_path=None, prefill_buckets=(128,),
                  qos: dict | None = None, weight_bits: int = 8,
                  vocoder_bf16: bool = False, kv_on_demand: bool = False):
    import dataclasses

    from tts_inference_tpu.config import (
        Config, EngineConfig, MeshConfig, ModelConfig, SnacConfig,
        StreamConfig, extended_kv_buckets, tiny_config,
    )
    from tts_inference_tpu.runtime import Runtime

    mesh_cfg = MeshConfig(dp=dp, tp=tp)
    if smoke:
        cfg = tiny_config()
        if prefix_cache:
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, prefix_cache=True))
        if qos:
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, **qos))
        if tp * dp > 1:
            cfg = dataclasses.replace(cfg, mesh=mesh_cfg)
        return Runtime.create(cfg, warmup=False,
                              tokenizer_path=tokenizer_path)
    base_eng = EngineConfig()
    cfg = Config(
        model=ModelConfig(use_pallas_attention=pallas_attention),
        engine=EngineConfig(
            max_input_len=128,
            max_output_len=max_output,
            max_batch_size=slots,
            prefill_buckets=tuple(prefill_buckets),
            decode_steps_per_call=steps_per_call,
            kv_cache_int8=kv_int8,
            kv_cache_int4=kv_int4,
            prefix_cache=prefix_cache,
            paged_kv=paged_kv,
            kv_on_demand=kv_on_demand,
            kv_pool_tokens=kv_pool_tokens,
            kv_buckets=extended_kv_buckets(
                base_eng.kv_buckets, 128 + max_output
            ),
            **(qos or {}),
        ),
        # match the per-request stream settings so the TTFA first-burst
        # graph gets registered/warmed for this exact configuration
        stream=StreamConfig(frames_per_chunk=CHUNK_FRAMES,
                            first_chunk_frames=1,
                            lookahead_frames=3, left_context_frames=6,
                            first_chunk_lookahead=first_lookahead),
        snac=SnacConfig(dtype="bfloat16" if vocoder_bf16 else "float32"),
        mesh=mesh_cfg,
    )
    return Runtime.create(cfg, warmup=False, quantize=quantize,
                          tokenizer_path=tokenizer_path,
                          weight_bits=weight_bits)


def sampling_for(tokens: int, seed: int):
    from tts_inference_tpu import protocol as P
    from tts_inference_tpu.config import SamplingConfig

    return SamplingConfig(
        max_tokens=tokens, seed=seed,
        token_range=(P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB),
    )


CHUNK_FRAMES = 4   # steady-state frames per vocode chunk (--chunk-frames)
STAGGER_CHUNKS = True   # de-phase concurrent streams' chunk boundaries


def stream_cfg(first_lookahead=None, chunk=None):
    from tts_inference_tpu.config import StreamConfig

    # lookahead 3 is bit-exact for our vocoder (influence reach ±2.29
    # frames, test-enforced); first chunk emits at 1 stable frame.
    # Larger frames_per_chunk amortizes the fixed left_context+lookahead
    # window overhead ((6+c+3)/c redundancy: 3.25x at c=4, 1.56x at c=16)
    # — a throughput lever for batch operating points where inter-chunk
    # cadence is secondary to aggregate RTF.
    return StreamConfig(frames_per_chunk=int(chunk or CHUNK_FRAMES),
                        first_chunk_frames=1,
                        lookahead_frames=3, left_context_frames=6,
                        first_chunk_lookahead=first_lookahead,
                        stagger_chunks=STAGGER_CHUNKS)


TEXT = "The quick brown fox jumps over the lazy dog near the river bank."


def run_single(rt, tokens: int, first_lookahead=None, iters: int = 1) -> dict:
    import numpy as np

    from tts_inference_tpu import protocol as P

    def one_pass():
        t0 = time.perf_counter()
        n_samples, ttfa, gaps, last = 0, None, [], None
        for chunk in rt.pipeline.stream(
            TEXT, "tara", sampling_for(tokens, 0),
            stream_cfg(first_lookahead),
            force_speech=True,
        ):
            now = time.perf_counter()
            ttfa = ttfa if ttfa is not None else (now - t0) * 1000.0
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

    one_pass()           # cold (compiles)
    passes = [one_pass() for _ in range(max(1, iters))]
    if len(passes) == 1:
        return passes[0]
    # median over warm passes (tunnel dispatch jitter is ±tens of ms);
    # gaps report the worst pass, TTFA adds a p95 across passes
    med = {k: float(np.median([p[k] for p in passes])) for k in passes[0]}
    med["max_gap_ms"] = max(p["max_gap_ms"] for p in passes)
    med["ttfa_p95_ms"] = float(np.percentile(
        [p["ttfa_ms"] for p in passes], 95))
    med["iters"] = len(passes)
    return med


def run_concurrent(rt, tokens: int, streams: int,
                   use_native: bool = False,
                   pipeline_depth: int = 2, iters: int = 1,
                   token_list=None, tick_profile: bool = False,
                   steps_override=None, chunk_override=None,
                   sched=None, declared_tokens=None) -> dict:

    import numpy as np

    from tts_inference_tpu import protocol as P
    from tts_inference_tpu.engine.scheduler import Scheduler, TTSRequest

    own_sched = sched is None
    if own_sched:
        cfg = rt.config
        if steps_override:
            # one-boot sweep support: a fresh Scheduler (new EngineCore
            # over the same device params) with a different
            # decode_steps_per_call — boot cost is paid once per PROCESS,
            # not per config
            import dataclasses

            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, decode_steps_per_call=int(steps_override)))
        sched = Scheduler(
            rt.engine.core.params, cfg, rt.vocoder, rt.tokenizer,
            mesh=rt.mesh, use_native=use_native,
        )
    sched.pipeline_depth = pipeline_depth
    sched.start()

    def one_pass() -> dict:
        reqs = [
            TTSRequest(
                text=TEXT, voice="tara",
                sampling=sampling_for(
                    token_list[i] if token_list else tokens, seed=100 + i
                ),
                stream_cfg=stream_cfg(chunk=chunk_override),
                force_speech=True,
                budget_tokens=declared_tokens,
            )
            for i in range(streams)
        ]
        t0 = time.perf_counter()
        for r in reqs:
            sched.submit(r)
        # single multiplexing collector (like the server's event loop);
        # one thread per stream serializes on the GIL and inflates gaps
        stats = {
            i: {"ttfa_ms": None, "samples": 0, "last": None, "gaps": []}
            for i in range(streams)
        }
        done = 0
        while done < streams:
            progress = False
            for i, r in enumerate(reqs):
                try:
                    kind, payload = r.events.get_nowait()
                except Exception:
                    continue
                progress = True
                now = time.perf_counter()
                s = stats[i]
                if kind == "chunk":
                    if s["ttfa_ms"] is None:
                        s["ttfa_ms"] = (now - t0) * 1000.0
                    if s["last"] is not None:
                        s["gaps"].append((now - s["last"]) * 1000.0)
                    s["last"] = now
                    s["samples"] += payload.samples
                elif kind == "done":
                    done += 1
                else:
                    raise RuntimeError(payload)
            if not progress:
                time.sleep(0.002)
        wall = time.perf_counter() - t0
        for s in stats.values():
            s["ttfa_ms"] = s["ttfa_ms"] or 0.0
            s["audio_s"] = s["samples"] / P.SAMPLE_RATE
            s["max_gap_ms"] = max(s["gaps"]) if s["gaps"] else 0.0
        total_audio = sum(s["audio_s"] for s in stats.values())
        out = {
            "wall_s": wall,
            "audio_s": total_audio,
            "aggregate_rtf": total_audio / wall,
            "per_stream_rtf": total_audio / wall / streams,
            "ttfa_p95_ms": float(np.percentile(
                [s["ttfa_ms"] for s in stats.values()], 95)),
            "worst_gap_ms": max(s["max_gap_ms"] for s in stats.values()),
            "streams": streams,
        }
        if token_list:
            # per-class TTFA split for the QoS mode: "short" = the minority
            # class with the smaller token budget
            short_t = min(token_list)
            for name, sel in (("short", lambda i: token_list[i] == short_t),
                              ("long", lambda i: token_list[i] != short_t)):
                vals = [stats[i]["ttfa_ms"] for i in range(streams)
                        if sel(i)]
                if vals:
                    out[f"{name}_ttfa_p95_ms"] = float(
                        np.percentile(vals, 95))
                    out[f"{name}_ttfa_med_ms"] = float(np.median(vals))
                    out[f"{name}_n"] = len(vals)
        return out

    try:
        t_cold = time.perf_counter()
        one_pass()           # cold (compiles)
        print(json.dumps({"cold_pass_s":
                          round(time.perf_counter() - t_cold, 1)}),
              file=sys.stderr, flush=True)
        if tick_profile:
            sched.enable_tick_profile()
        passes = [one_pass() for _ in range(max(1, iters))]
        if tick_profile and sched.tick_profile:
            tp = sched.tick_profile
            n = max(1, tp.pop("ticks"))
            per_tick = {k: round(v / n * 1000.0, 3) for k, v in tp.items()}
            print(json.dumps({"tick_profile_ms_per_tick": per_tick,
                              "ticks": n}), file=sys.stderr)
            passes[-1]["tick_profile"] = per_tick
    finally:
        if own_sched:
            sched.stop()
    if len(passes) == 1:
        return passes[0]
    med = {k: float(np.median([p[k] for p in passes]))
           for k in passes[0] if k != "streams"}
    med["worst_gap_ms"] = max(p["worst_gap_ms"] for p in passes)
    med["streams"] = streams
    med["iters"] = len(passes)
    return med


def capacity_main(args) -> int:
    """The realtime-capacity frontier (VERDICT r4 #1).

    Per-point GEOMETRY, not per-point load: a fixed B-slot graph spends
    the same decode step on 8 active streams as on B (masked rows still
    compute), so per-stream RTF is flat ~aggregate(B)/B at every N —
    measured on-chip: 0.83 at 8-on-64, 0.80 at 16-on-64, 0.66 at
    64-on-64. The deployable frontier question is "what's the largest N
    for which an N-slot engine serves N streams at realtime", so each
    point boots slots=N in its OWN subprocess (in-process HBM teardown
    fragments — the quant_ladder lesson) riding the persistent XLA cache.
    """
    import subprocess

    points = sorted({int(x) for x in args.capacity_points.split(",")})
    if args.smoke:
        points = [1, 2]
    frontier, frontier_row, rows = 0, None, []
    for n in points:
        cmd = [sys.executable, __file__, "--mode", "concurrent",
               "--streams", str(n), "--slots", str(n),
               "--iters", str(args.iters), "--tokens", str(args.tokens),
               "--pipeline-depth", str(args.pipeline_depth),
               "--json-extra"]
        if not args.smoke:
            # dense int8-KV is the fastest N-on-N serving config (paged
            # costs ~20% in kernel overhead at these batch sizes and only
            # pays off under oversubscription / long-audio pools) — pass
            # --paged-kv to measure the paged+on-demand curve instead
            if args.paged_kv:
                cmd += ["--paged-kv", "--kv-on-demand"]
            cmd += ["--kv-int4"] if args.kv_int4 else ["--kv-int8"]
        else:
            cmd += ["--smoke"]
        if args.steps_per_call:
            cmd += ["--steps-per-call", str(args.steps_per_call)]
        if args.weight_bits != 8:
            cmd += ["--weight-bits", str(args.weight_bits)]
        if args.declared_tokens:
            cmd += ["--declared-tokens", str(args.declared_tokens)]
        if args.real_tokenizer:
            cmd += ["--real-tokenizer"]
        r = subprocess.run(cmd, capture_output=True, text=True)
        try:
            point = json.loads(r.stdout.strip().splitlines()[-1])
            det = point["detail"]
        except Exception:
            print(json.dumps({"capacity_point_error": {
                "streams": n, "rc": r.returncode,
                "tail": r.stderr[-1500:]}}), file=sys.stderr, flush=True)
            continue
        ok = (det["per_stream_rtf"] >= 1.0
              and det["ttfa_p95_ms"] <= args.capacity_ttfa_ms
              and det["worst_gap_ms"] <= args.capacity_gap_ms)
        row = {
            "streams": n, "slots": n,
            "per_stream_rtf": round(det["per_stream_rtf"], 3),
            "aggregate_rtf": round(det["aggregate_rtf"], 2),
            "ttfa_p95_ms": round(det["ttfa_p95_ms"], 1),
            "worst_gap_ms": round(det["worst_gap_ms"], 1),
            "realtime_ok": ok,
        }
        rows.append(row)
        print(json.dumps({"capacity_point": row}), file=sys.stderr,
              flush=True)
        if ok and n > frontier:
            frontier, frontier_row = n, dict(row)
        if det["per_stream_rtf"] < 0.8:
            break   # deep past the frontier; higher N only gets worse
    # the reference serializes requests behind a lock (max_batch_size=1
    # engines, SURVEY §2.3) at 1.42x RTF: its realtime capacity is 1
    result = {
        "metric": "capacity_streams_at_realtime",
        "value": frontier,
        "unit": "streams",
        "vs_baseline": float(frontier),
    }
    if args.json_extra:
        detail = dict(frontier_row or (rows[-1] if rows else {}))
        detail["curve"] = rows
        result["detail"] = detail
    print(json.dumps(result))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=("single", "concurrent", "long", "qos",
                             "capacity"),
                    default="concurrent")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=420)
    ap.add_argument("--long-seconds", type=float, default=102.0,
                    help="long mode: audio seconds per stream (the "
                         "reference's long-audio engine class: 12k-token "
                         "builds ≈145 s, hindi_canopy/build_engine.py)")
    ap.add_argument("--no-quantize", dest="quantize", action="store_false",
                    help="disable int8 weight-only quantization (the "
                         "default serving configuration)")
    ap.set_defaults(quantize=True)
    ap.add_argument("--tick-profile", action="store_true",
                    help="concurrent mode: per-phase scheduler tick "
                         "attribution (the 64-slot knee profile, PERF.md)")
    ap.add_argument("--weight-bits", type=int, default=8, choices=(8, 4),
                    help="4 = per-group int4 linears via the Pallas matvec "
                         "kernel (halves the decode weight read; PERF.md)")
    ap.add_argument("--steps-per-call", type=int, default=None,
                    help="decode tokens per device dispatch (default: 14 "
                         "concurrent / 7 single — PERF.md round 2)")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="in-flight decode launches (scheduler)")
    ap.add_argument("--slots", type=int, default=8,
                    help="continuous-batching slots (cache size scales)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache (2x slot capacity)")
    ap.add_argument("--kv-int4", action="store_true",
                    help="int4 KV pools (requires --paged-kv): halves the "
                         "int8 pools' bytes again — KV-read-bound regimes "
                         "(long-audio, 64 slots)")
    ap.add_argument("--first-lookahead", type=int, default=None,
                    help="progressive lookahead for the first chunk "
                         "(single mode; trades bounded first-chunk error "
                         "for ~85 ms TTFA per frame)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="enable prompt prefix KV caching")
    ap.add_argument("--paged-kv", action="store_true",
                    help="paged/blocked KV cache")
    ap.add_argument("--kv-pool-tokens", type=int, default=None,
                    help="paged KV pool size in tokens")
    ap.add_argument("--kv-on-demand", action="store_true",
                    help="vLLM-style on-demand paged-KV growth + preempt-"
                         "and-resume on exhaustion (requires --paged-kv); "
                         "admission no longer reserves max_tokens worst-"
                         "case, so the same pool admits more streams")
    ap.add_argument("--capacity-points", default="8,16,24,32,40,48,56,64",
                    help="capacity mode: comma-separated concurrent-stream "
                         "counts to measure on ONE booted engine")
    ap.add_argument("--capacity-ttfa-ms", type=float, default=500.0,
                    help="capacity mode: max acceptable TTFA p95")
    ap.add_argument("--capacity-gap-ms", type=float, default=500.0,
                    help="capacity mode: max acceptable inter-chunk gap")
    ap.add_argument("--declared-tokens", type=int, default=None,
                    help="declared output budget per request (admission/KV "
                         "reservation) while --tokens drives actual "
                         "emission — models real EOS-before-budget traffic "
                         "(worst-case reservation pays the declaration; "
                         "--kv-on-demand pays only actual emission)")
    ap.add_argument("--pallas-attention", action="store_true",
                    help="Pallas decode-attention kernel (with --paged-kv: "
                         "the block-streaming paged kernel)")
    ap.add_argument("--native-protocol", action="store_true",
                    help="C++ extractor + deinterleave in the scheduler")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree (mesh tp axis)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel degree (slots over replicas)")
    ap.add_argument("--virtual-devices", type=int, default=None,
                    help="force N virtual CPU devices (sharding without "
                         "hardware; implies CPU platform)")
    ap.add_argument("--iters", type=int, default=9,
                    help="warm passes to median over. Engine-level runs "
                         "show ±10%% run-to-run spread (PERF.md round-3 "
                         "variance study; the r3 driver scoreboard dipped "
                         "17.07 at iters=3 while an idle-host 10-iter "
                         "median read 18.15) — the default is sized so the "
                         "headline is a stable median, not a draw")
    ap.add_argument("--real-tokenizer", action="store_true",
                    help="use a REAL BPE tokenizer (tiny trained fixture, "
                         "tools/tokenizer_fixture.py) + 16/32/64/128 "
                         "prefill buckets — the production tokenizer path; "
                         "a real prompt lands in the 32 bucket instead of "
                         "the 128 one byte-fallback ids force (TTFA)")
    ap.add_argument("--vocoder-bf16", action="store_true",
                    help="SNAC conv stack in bfloat16 — 1.75x faster at the "
                         "64-row vocode burst, a wash at 8 rows (PERF.md "
                         "round-5 saturation model; fidelity bound: "
                         "tools/vocoder_dtype_fidelity.py)")
    ap.add_argument("--chunk-frames", type=int, default=4,
                    help="steady-state frames per vocode chunk (bigger = "
                         "less windowed-redecode overhead, coarser cadence)")
    ap.add_argument("--sweep", default=None,
                    help="concurrent mode: comma-separated steps[:depth] "
                         "configs measured in ONE boot (e.g. "
                         "'14:2,21:2,28:3'); per-config JSON to stderr, "
                         "best to stdout")
    ap.add_argument("--no-stagger", dest="stagger", action="store_false",
                    help="disable chunk-boundary de-phasing "
                         "(StreamConfig.stagger_chunks). Stagger is the "
                         "capacity-frontier lever (worst-gap -28%% at 32 "
                         "streams) but SPLITS the lockstep 64-slot burst "
                         "into launch-bound small vocode calls — the "
                         "batch-record config wants it off (PERF.md "
                         "round-5 saturation model)")
    ap.set_defaults(stagger=True)
    ap.add_argument("--json-extra", action="store_true")
    args = ap.parse_args()
    global CHUNK_FRAMES, STAGGER_CHUNKS
    CHUNK_FRAMES = args.chunk_frames
    STAGGER_CHUNKS = args.stagger
    if args.virtual_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
    if args.smoke or args.virtual_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.steps_per_call is None:
        args.steps_per_call = 7 if args.mode == "single" else 14
    max_output = 2048
    qos_cfg = None
    token_list = None
    if args.mode == "qos":
        # oversubscription QoS (VERDICT r2 #4; reference goal ~100 users,
        # spec.md:137-139): 2×-slots mixed demand, shorts submitted LAST
        # (the adversarial order for FIFO). sjf + reserved short slots must
        # keep short-request TTFA bounded while longs still finish.
        if args.smoke:
            args.streams = 6   # tiny CPU runtime has 4 slots
            n_short = 2
            token_list = [70] * 4 + [14] * n_short
            qos_cfg = dict(admission_policy="sjf",
                           reserved_short_slots=1,
                           short_request_tokens=14)
        else:
            if args.slots == 8:
                args.slots = 32
            if args.streams == 8:
                args.streams = 2 * args.slots
            args.kv_int8 = True
            n_short = args.streams // 4
            token_list = [420] * (args.streams - n_short) + [84] * n_short
            qos_cfg = dict(
                admission_policy="sjf",
                reserved_short_slots=max(2, args.slots // 8),
                short_request_tokens=128,
            )
    if args.mode == "capacity":
        # the realtime-capacity frontier (VERDICT r4 #1): the PRODUCT
        # number the reference's roadmap asks for ("~5 users today, scale
        # to ~100", spec.md:133,137-139) — max concurrent streams with
        # per-stream RTF ≥ 1.0, TTFA p95 ≤ 500 ms and no inter-chunk gap
        # > 500 ms — NOT the batch-throughput record. Runs before any
        # parent boot: each point owns the chip in its own subprocess.
        return capacity_main(args)
    if args.mode == "long":
        # the reference's long-audio engine class (12,000 output tokens,
        # hindi_canopy/build_engine.py:61): paged KV is what makes a
        # 12.5k-token per-slot budget affordable at batch ≥4
        import math

        from tts_inference_tpu import protocol as P

        args.tokens = math.ceil(
            args.long_seconds * P.SAMPLE_RATE / P.SAMPLES_PER_FRAME
        ) * P.FRAME_SIZE
        # ≥ the reference's 12,000-token class, rounded so max_seq
        # (128 input + output) is a multiple of the 128-token KV block
        max_output = 12032
        args.paged_kv = True
        if args.slots == 8:
            args.slots = 4
        if args.streams == 8:
            args.streams = 4
        if args.kv_pool_tokens is None:
            args.kv_pool_tokens = args.slots * (128 + max_output + 16)
    tokenizer_path = None
    prefill_buckets = (128,)
    if args.real_tokenizer:
        import os
        import tempfile

        from tts_inference_tpu.tools.tokenizer_fixture import (
            write_tiny_tokenizer,
        )

        tokenizer_path = os.path.join(
            tempfile.gettempdir(), "tts_bench_tokenizer"
        )
        if not os.path.exists(os.path.join(tokenizer_path, "tokenizer.json")):
            write_tiny_tokenizer(tokenizer_path)
        prefill_buckets = (16, 32, 64, 128)
    if args.kv_int4 and args.kv_int8:
        args.kv_int8 = False   # int4 supersedes when both are requested
    t_boot = time.perf_counter()
    rt = build_runtime(args.smoke, args.quantize, args.steps_per_call,
                       args.slots, args.kv_int8, args.tp, args.dp,
                       kv_int4=args.kv_int4,
                       prefix_cache=args.prefix_cache, paged_kv=args.paged_kv,
                       kv_pool_tokens=args.kv_pool_tokens,
                       pallas_attention=args.pallas_attention,
                       first_lookahead=args.first_lookahead,
                       max_output=max_output, tokenizer_path=tokenizer_path,
                       prefill_buckets=prefill_buckets, qos=qos_cfg,
                       weight_bits=args.weight_bits,
                       vocoder_bf16=args.vocoder_bf16,
                       kv_on_demand=args.kv_on_demand)
    # boot anatomy to stderr (PERF.md boot-budget rows; the JSON contract
    # on stdout stays one line)
    print(json.dumps({
        "boot_s": round(time.perf_counter() - t_boot, 1),
        "load_timings": {k: (round(v, 2) if isinstance(v, float) else v)
                         for k, v in rt.load_timings.items()},
    }), file=sys.stderr, flush=True)
    if args.mode == "long":
        warm = run_concurrent(rt, args.tokens, args.streams,
                              args.native_protocol, args.pipeline_depth,
                              max(1, args.iters - 1))
        result = {
            "metric": (f"long_audio_aggregate_rtf_{args.streams}streams_"
                       f"{int(args.long_seconds)}s"),
            "value": round(warm["aggregate_rtf"], 4),
            "unit": "x_realtime",
            "vs_baseline": round(warm["aggregate_rtf"] / BASELINE_RTF, 4),
        }
    elif args.mode == "qos":
        warm = run_concurrent(rt, args.tokens, args.streams,
                              args.native_protocol, args.pipeline_depth,
                              max(1, args.iters - 1), token_list=token_list)
        # vs_baseline: improvement over the round-2 FIFO measurement of the
        # same 64-on-32 scenario (p95 TTFA 6.5 s for ALL requests, PERF.md)
        result = {
            "metric": (f"qos_short_ttfa_p95_ms_{args.streams}on"
                       f"{args.slots}"),
            "value": round(warm["short_ttfa_p95_ms"], 1),
            "unit": "ms",
            "vs_baseline": round(6500.0 / max(warm["short_ttfa_p95_ms"],
                                              1e-9), 2),
        }
    elif args.mode == "single":
        warm = run_single(rt, args.tokens, args.first_lookahead, args.iters)
        result = {
            "metric": "warm_streaming_rtf",
            "value": round(warm["rtf"], 4),
            "unit": "x_realtime",
            "vs_baseline": round(warm["rtf"] / BASELINE_RTF, 4),
        }
    elif args.sweep:
        # one-boot (steps, depth) sweep — the dispatch-campaign tool: each
        # config gets a fresh Scheduler over the same booted runtime
        streams = args.streams
        best = None
        for spec in args.sweep.split(","):
            parts = spec.split(":")
            st = int(parts[0])
            dp = int(parts[1]) if len(parts) > 1 and parts[1] \
                else args.pipeline_depth
            ck = int(parts[2]) if len(parts) > 2 and parts[2] \
                else args.chunk_frames
            warm = run_concurrent(
                rt, args.tokens, streams, args.native_protocol, dp,
                args.iters, tick_profile=args.tick_profile,
                steps_override=st, chunk_override=ck,
            )
            row = {"steps": st, "depth": dp, "chunk": ck,
                   "aggregate_rtf": round(warm["aggregate_rtf"], 3),
                   "ttfa_p95_ms": round(warm.get("ttfa_p95_ms", 0), 1)}
            print(json.dumps({"sweep": row}), file=sys.stderr, flush=True)
            if best is None or warm["aggregate_rtf"] > best[0]:
                best = (warm["aggregate_rtf"], row, warm)
        warm = best[2]
        ck_tag = (f"c{best[1]['chunk']}" if best[1]["chunk"] != 4 else "")
        result = {
            "metric": (f"aggregate_streaming_rtf_{streams}streams_sweep"
                       f"_s{best[1]['steps']}d{best[1]['depth']}{ck_tag}"),
            "value": round(best[0], 4),
            "unit": "x_realtime",
            "vs_baseline": round(best[0] / BASELINE_RTF, 4),
        }
    else:
        streams = 2 if args.smoke else args.streams
        warm = run_concurrent(rt, args.tokens, streams,
                              args.native_protocol, args.pipeline_depth,
                              args.iters, tick_profile=args.tick_profile,
                              declared_tokens=args.declared_tokens)
        result = {
            "metric": f"aggregate_streaming_rtf_{streams}streams",
            "value": round(warm["aggregate_rtf"], 4),
            "unit": "x_realtime",
            "vs_baseline": round(warm["aggregate_rtf"] / BASELINE_RTF, 4),
        }
    if args.json_extra:
        result["detail"] = {k: (round(v, 2) if isinstance(v, float) else v)
                            for k, v in warm.items()}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
