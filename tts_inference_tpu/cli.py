"""CLI entry points.

Covers the reference's local entrypoints:
- `generate`    — text → WAV (reference: `modal run tensorrt_tts/inference.py
                  --text … --output …`, SURVEY.md §3.2)
- `aot-compile` — warm/pin the XLA compilation cache + build_info.json
                  (reference: `build_engine.py` engine build, §3.3)
- `serve`       — FastAPI WS/HTTP server (reference: `modal serve
                  vllm_inference/modal_audio_stream.py`, §3.1)
- `dump-tokens` — raw token stream for a prompt (reference: `/dump-tokens`)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_runtime_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model-path", help="HF checkpoint dir (safetensors)")
    p.add_argument("--snac-path", help="SNAC checkpoint dir")
    p.add_argument("--lora-path", help="LoRA adapter dir to merge at load")
    p.add_argument("--tokenizer-path", help="tokenizer dir (defaults to model)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight runtime (no assets needed)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compile-cache", help="persistent XLA compile cache dir")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="int8 weight-only quantization (serving)")
    p.add_argument("--weight-bits", type=int, default=8, choices=(8, 4),
                   help="with --quantize: 8 = per-channel int8 (default), "
                        "4 = per-group int4 linears via the Pallas matvec "
                        "kernel (embed/head stay int8)")
    p.add_argument("--max-input-len", type=int, default=None)
    p.add_argument("--max-output-len", type=int, default=None)
    p.add_argument("--max-batch-size", type=int, default=None)
    p.add_argument("--prefill-buckets", default=None,
                   help="comma-separated prompt buckets, e.g. 64,128")
    p.add_argument("--prefix-cache", action="store_true",
                   help="cache KV for repeated prompt prefixes (the "
                        "reference's vLLM enable_prefix_caching analog)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache: 2x slot capacity, half attention "
                        "read bandwidth (32-slot serving needs this to "
                        "fit HBM)")
    p.add_argument("--kv-int4", action="store_true",
                   help="int4 KV pools (requires --paged-kv): halves the "
                        "int8 pools' bytes again — for the KV-read-bound "
                        "long-audio / 64-slot regimes; lossier than int8, "
                        "gate with tools/audio_fidelity.py")
    p.add_argument("--paged-kv", action="store_true",
                   help="paged/blocked KV cache (block pool + per-slot "
                        "tables; capacity-gated admission)")
    p.add_argument("--kv-pool-tokens", type=int, default=None,
                   help="paged KV pool size in tokens")
    p.add_argument("--kv-on-demand", action="store_true",
                   help="vLLM-style on-demand paged-KV growth (requires "
                        "--paged-kv): admission reserves only the prefill "
                        "window; blocks grow per decode call and on pool "
                        "exhaustion the scheduler preempts the youngest "
                        "stream and resumes it bit-identically — the same "
                        "pool admits far more concurrent streams")
    p.add_argument("--vocoder-bf16", action="store_true",
                   help="run the SNAC conv stack in bfloat16 (f32 "
                        "accumulate, f32 PCM out): ~2x the vocoder's HBM/"
                        "MXU budget for the throughput regimes; windowed "
                        "streaming stays bit-exact within the bf16 path — "
                        "gate fidelity vs f32 with tools/audio_fidelity.py")
    p.add_argument("--kv-block-size", type=int, default=None,
                   help="paged KV block size (tokens/block; must divide "
                        "max_seq_len)")
    p.add_argument("--kv-buckets", default=None,
                   help="comma-separated KV attention-window buckets "
                        "(default: doubling series auto-extended to "
                        "max_seq_len — long-audio engines get 8192…)")
    p.add_argument("--admission-policy", choices=("fifo", "sjf"),
                   default=None,
                   help="oversubscription QoS: 'sjf' = shortest-job-first "
                        "with aging (short interactive requests stop "
                        "queueing behind long-audio jobs)")
    p.add_argument("--reserved-short-slots", type=int, default=None,
                   help="slots only short requests (max_tokens ≤ "
                        "--short-tokens) may occupy")
    p.add_argument("--short-tokens", type=int, default=None,
                   help="'short request' threshold in tokens (default 896 "
                        "≈ 10.9 s of audio)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (mesh tp axis over ICI)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree (request slots over replicas)")
    p.add_argument("--virtual-devices", type=int, default=None,
                   help="force N virtual CPU devices (test multi-chip "
                        "sharding without hardware; implies --cpu)")


def _build_runtime(args, mesh=None):
    if getattr(args, "virtual_devices", None):
        # must land before jax initializes its backends
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
        args.cpu = True
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tts_inference_tpu.config import Config, MeshConfig, tiny_config
    from tts_inference_tpu.runtime import Runtime

    import dataclasses

    cfg = tiny_config() if args.tiny else Config()
    tp, dp = getattr(args, "tp", 1), getattr(args, "dp", 1)
    if tp * dp > 1:
        cfg = dataclasses.replace(cfg, mesh=MeshConfig(dp=dp, tp=tp))
    eng_over = {}
    if args.compile_cache:
        eng_over["compilation_cache_dir"] = args.compile_cache
    if args.max_input_len:
        eng_over["max_input_len"] = args.max_input_len
    if args.max_output_len:
        eng_over["max_output_len"] = args.max_output_len
    if args.max_batch_size:
        eng_over["max_batch_size"] = args.max_batch_size
    if args.prefill_buckets:
        eng_over["prefill_buckets"] = tuple(
            int(x) for x in args.prefill_buckets.split(",")
        )
    if getattr(args, "prefix_cache", False):
        eng_over["prefix_cache"] = True
    if getattr(args, "kv_int8", False):
        eng_over["kv_cache_int8"] = True
    if getattr(args, "kv_int4", False):
        eng_over["kv_cache_int4"] = True
    if getattr(args, "paged_kv", False):
        eng_over["paged_kv"] = True
    if getattr(args, "kv_pool_tokens", None):
        eng_over["kv_pool_tokens"] = args.kv_pool_tokens
    if getattr(args, "kv_on_demand", False):
        eng_over["kv_on_demand"] = True
    if getattr(args, "kv_block_size", None):
        eng_over["kv_block_size"] = args.kv_block_size
    if getattr(args, "admission_policy", None):
        eng_over["admission_policy"] = args.admission_policy
    if getattr(args, "reserved_short_slots", None) is not None:
        eng_over["reserved_short_slots"] = args.reserved_short_slots
    if getattr(args, "short_tokens", None) is not None:
        eng_over["short_request_tokens"] = args.short_tokens
    if getattr(args, "kv_buckets", None):
        eng_over["kv_buckets"] = tuple(
            int(x) for x in args.kv_buckets.split(",")
        )
    if eng_over:
        cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine, **eng_over)
        )
    if getattr(args, "vocoder_bf16", False):
        cfg = dataclasses.replace(
            cfg, snac=dataclasses.replace(cfg.snac, dtype="bfloat16")
        )
    if not getattr(args, "kv_buckets", None):
        # long-audio engines (e.g. the reference's 12,000-output-token
        # hindi_canopy build) need window buckets past the default 4096 so
        # mid-length decodes don't read the full max_seq window
        from tts_inference_tpu.config import extended_kv_buckets

        cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
            cfg.engine, kv_buckets=extended_kv_buckets(
                cfg.engine.kv_buckets, cfg.engine.max_seq_len
            ),
        ))
    return Runtime.create(
        cfg,
        model_path=args.model_path,
        snac_path=args.snac_path,
        lora_path=args.lora_path,
        tokenizer_path=args.tokenizer_path,
        seed=args.seed,
        warmup=not args.no_warmup,
        quantize=args.quantize,
        weight_bits=args.weight_bits,
        mesh=mesh,
    )


def cmd_generate(args) -> int:
    from tts_inference_tpu.config import SamplingConfig
    from tts_inference_tpu.utils.audio import duration_s, write_wav

    from tts_inference_tpu import protocol

    rt = _build_runtime(args)
    sampling = SamplingConfig(
        temperature=args.temperature, top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        max_tokens=args.max_tokens, greedy=args.greedy, seed=args.seed,
        token_range=(
            (protocol.TOKEN_AUDIO_BASE,
             protocol.TOKEN_AUDIO_BASE + protocol.AUDIO_VOCAB)
            if args.audio_only else None
        ),
    )
    t0 = time.perf_counter()
    pcm, metrics = rt.pipeline.synthesize(
        args.text, args.voice, sampling, force_speech=args.force_speech
    )
    wall = time.perf_counter() - t0
    write_wav(args.output, pcm)
    print(json.dumps({
        "output": args.output,
        "audio_duration_s": round(duration_s(pcm), 3),
        "wall_s": round(wall, 3),
        "ttfa_ms": round(metrics.ttfa_ms, 1),
        "ttft_ms": round(metrics.ttft_ms, 1),
        "tokens": metrics.tokens,
        "tokens_per_sec": round(metrics.tokens_per_sec, 1),
        "rtf": round(metrics.rtf, 3),
        "chunks": metrics.chunks,
    }))
    return 0


def cmd_dump_tokens(args) -> int:
    from tts_inference_tpu.config import SamplingConfig

    rt = _build_runtime(args)
    prompt = rt.pipeline.build_prompt(args.text, args.voice)
    res = rt.engine.generate(
        prompt, SamplingConfig(max_tokens=args.max_tokens, seed=args.seed)
    )
    print(json.dumps({"prompt_ids": prompt, "token_ids": res.token_ids,
                      "timings": res.timings}))
    return 0


def cmd_aot_compile(args) -> int:
    if args.spawn:
        # fire-and-forget build (reference: hindi_canopy/spawn_build.py
        # `build_engine.spawn()`): detach a child that does the compile
        # into the persistent XLA cache; this process returns immediately
        import subprocess

        argv = [a for a in sys.argv[1:] if a != "--spawn"]
        with open(args.spawn_log, "ab") as log:
            proc = subprocess.Popen(
                [sys.executable, "-m", "tts_inference_tpu.cli", *argv],
                stdout=log, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
        print(json.dumps({"spawned_pid": proc.pid, "log": args.spawn_log}))
        return 0
    rt = _build_runtime(args)
    rt.write_build_info(args.build_info)
    print(json.dumps({"build_info": args.build_info,
                      "timings": rt.load_timings}))
    return 0


def cmd_quantize(args) -> int:
    """Offline weight quantization: checkpoint in → pre-quantized orbax
    checkpoint out. Serving boots from the output skip the minutes-long
    eager re-quantization of the 3B tree (the weight-side analog of the
    reference's TRT save-engine/reload flow, build_engine.py:141-150;
    graphs are covered separately by `aot-compile` + the XLA cache)."""
    from tts_inference_tpu.models.quant import (
        quantize_llama_params, to_plain)
    from tts_inference_tpu.training.checkpoint import save_params

    t0 = time.perf_counter()
    args.no_warmup = True       # weights only; graphs are aot-compile's job
    rt = _build_runtime(args)   # loads params; --quantize quantizes them
    params = rt.engine.core.params
    from tts_inference_tpu.models.quant import QuantEmbed, QuantLinear

    if not isinstance(params.get("embed"), (QuantEmbed, QuantLinear)):
        params = quantize_llama_params(params, bits=args.weight_bits)
    import dataclasses

    save_params(args.out, to_plain(params), metadata={
        "vocab_size": rt.config.model.vocab_size,
        "quantized": args.weight_bits,
        "model_config": dataclasses.asdict(rt.config.model),
    })
    print(json.dumps({"out": args.out, "weight_bits": args.weight_bits,
                      "wall_s": round(time.perf_counter() - t0, 1)}))
    return 0


def cmd_devices(args) -> int:
    """Device visibility check (reference: test_gpu.py nvidia-smi)."""
    import jax

    try:
        devices = jax.devices()
    except RuntimeError:
        # configured platform unavailable — fall back to autodetect
        jax.config.update("jax_platforms", "")
        devices = jax.devices()
    print(json.dumps({
        "platform": devices[0].platform,
        "devices": [str(d) for d in devices],
        "device_count": len(devices),
    }))
    return 0


def cmd_serve(args) -> int:
    from tts_inference_tpu.serving.app import run_app

    # lockstep multi-host serving (SURVEY §5.8 DCN / VERDICT r3 #2): one
    # logical engine spans N processes; process 0 owns the WS/HTTP API and
    # mirrors every device-entering EngineCore call to followers over a TCP
    # side channel (parallel/lockstep.py), so all processes enter the same
    # jitted graphs in lockstep SPMD.
    mesh = None
    want_warmup = not args.no_warmup
    if args.coordinator:
        if args.num_processes < 2:
            raise SystemExit("--coordinator requires --num-processes >= 2")
        if not args.multi_stream:
            raise SystemExit("lockstep serving requires the scheduler "
                             "(drop --single-stream)")
        from tts_inference_tpu.parallel.multihost import (
            init_multihost, make_global_mesh,
        )

        init_multihost(
            args.coordinator, args.num_processes, args.process_id,
            platform="cpu" if args.cpu else None,
            local_cpu_devices=args.virtual_devices,
        )
        args.virtual_devices = None     # applied by init_multihost
        mesh = make_global_mesh(tp=args.tp if args.tp > 1 else None)
        # Runtime warmup would enter mesh graphs through the UNMIRRORED
        # single-stream engine; the scheduler's warmup (mirrored) covers
        # every graph lockstep serving uses.
        args.no_warmup = True
    rt = _build_runtime(args, mesh=mesh)

    if args.coordinator and args.process_id != 0:
        # follower: connect the side channel FIRST — EngineCore.__init__
        # device_puts onto the multi-process mesh, which is a COLLECTIVE
        # (process_allgather value check), and process 0 only enters its
        # matching collective after accepting this connection; building the
        # core before connecting deadlocks the cluster
        from tts_inference_tpu import protocol
        from tts_inference_tpu.engine.engine import EngineCore
        from tts_inference_tpu.parallel import lockstep as LS

        host = args.coordinator.rsplit(":", 1)[0]
        sock = LS.follower_channel(host, args.lockstep_port,
                                   process_id=args.process_id)
        print(json.dumps({"lockstep_follower": args.process_id,
                          "status": "connected"}), flush=True)
        core = EngineCore(
            rt.engine.core.params, rt.config.model, rt.config.engine,
            eos_id=protocol.TOKEN_EOS, seed=args.seed, mesh=mesh,
        )
        try:
            n = LS.follower_loop(core, sock)
        except ConnectionError as e:
            # coordinator died: exit nonzero so a supervisor restarts the
            # whole lockstep group (deploy/launch.py --lockstep-processes)
            print(json.dumps({"lockstep_follower": args.process_id,
                              "error": str(e)}), flush=True)
            return 1
        print(json.dumps({"lockstep_follower": args.process_id,
                          "replayed_calls": n}), flush=True)
        return 0

    wrap_core = None
    mirror: list = []
    if args.coordinator:
        from tts_inference_tpu.parallel import lockstep as LS

        # bind the side channel to the coordinator's own (cluster-internal)
        # interface by default — never 0.0.0.0 unless explicitly asked
        bind = args.lockstep_bind or args.coordinator.rsplit(":", 1)[0]
        socks = LS.coordinator_channel(
            args.lockstep_port, args.num_processes - 1, bind=bind
        )

        def wrap_core(core):  # noqa: F811
            m = LS.MirroredCore(core, socks)
            mirror.append(m)
            return m

    scheduler = None
    if args.multi_stream:
        from tts_inference_tpu.engine.scheduler import Scheduler

        scheduler = Scheduler(
            rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer,
            seed=args.seed, mesh=mesh if args.coordinator else rt.mesh,
            use_native=args.native_protocol,
            wrap_core=wrap_core,
        )
        if args.coordinator:
            # the fused path feeds mesh-replicated tokens into a LOCAL
            # vocode jit — incompatible across processes; the async vocode
            # worker (host tokens → local device) handles first chunks
            scheduler.fuse_admission_vocode = False
        if want_warmup:
            print("warming scheduler graphs (first boot compiles; cached "
                  "afterwards)…", flush=True)
            print(scheduler.warmup(), flush=True)
    try:
        rc = run_app(rt, host=args.host, port=args.port, scheduler=scheduler,
                     lockstep=bool(args.coordinator))
    finally:
        for m in mirror:
            m.close()
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tts_inference_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="text → WAV")
    _add_runtime_args(g)
    g.add_argument("--text", required=True)
    g.add_argument("--voice", default="tara")
    g.add_argument("--output", default="output.wav")
    g.add_argument("--temperature", type=float, default=0.6)
    g.add_argument("--top-p", type=float, default=0.95)
    g.add_argument("--repetition-penalty", type=float, default=1.1)
    g.add_argument("--max-tokens", type=int, default=1200)
    g.add_argument("--greedy", action="store_true")
    g.add_argument("--force-speech", action="store_true",
                   help="append [DELIMITER, SOS] to the prompt (forces "
                        "immediate speech; needed with random weights)")
    g.add_argument("--audio-only", action="store_true",
                   help="constrain sampling to the audio token range")
    g.set_defaults(fn=cmd_generate)

    d = sub.add_parser("dump-tokens", help="raw LM token stream")
    _add_runtime_args(d)
    d.add_argument("--text", required=True)
    d.add_argument("--voice", default="tara")
    d.add_argument("--max-tokens", type=int, default=256)
    d.set_defaults(fn=cmd_dump_tokens)

    q = sub.add_parser("quantize",
                       help="offline weight quantization → orbax checkpoint "
                            "(serve boots skip re-quantizing)")
    _add_runtime_args(q)
    q.add_argument("--out", required=True,
                   help="output checkpoint dir (serve/generate "
                        "--model-path this)")
    q.set_defaults(fn=cmd_quantize)

    a = sub.add_parser("aot-compile", help="warm the XLA compile cache")
    _add_runtime_args(a)
    a.add_argument("--build-info", default="build_info.json")
    a.add_argument("--spawn", action="store_true",
                   help="fire-and-forget: detach the build and return "
                        "(reference: spawn_build.py)")
    a.add_argument("--spawn-log", default="aot_compile.log")
    a.set_defaults(fn=cmd_aot_compile)

    s = sub.add_parser("serve", help="HTTP/WS streaming server")
    _add_runtime_args(s)
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--multi-stream", action="store_true", default=True,
                   help="continuous-batching scheduler (default; even ONE "
                        "stream is faster through it: RTF 2.10 vs 1.71, "
                        "TTFA p95 213 vs 228 ms measured — async vocode + "
                        "fused admission)")
    s.add_argument("--single-stream", dest="multi_stream",
                   action="store_false",
                   help="serialized single-engine mode (the reference's "
                        "global-lock behavior; debug/A-B use)")
    s.add_argument("--native-protocol", action="store_true",
                   help="C++ token extractor + deinterleave in the "
                        "scheduler hot path (native/tts_runtime.cpp)")
    s.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="lockstep multi-host serving: jax.distributed "
                        "coordinator address; one logical engine spans all "
                        "processes, process 0 serves the API "
                        "(parallel/lockstep.py)")
    s.add_argument("--num-processes", type=int, default=1,
                   help="total processes in the lockstep cluster")
    s.add_argument("--process-id", type=int, default=0,
                   help="this process's index (0 = API owner)")
    s.add_argument("--lockstep-port", type=int, default=18765,
                   help="TCP side-channel port on the coordinator host for "
                        "mirrored EngineCore calls")
    s.add_argument("--lockstep-bind", default=None,
                   help="interface the coordinator binds the side channel "
                        "to (default: the --coordinator host). The channel "
                        "carries pickled descriptors — keep it on a trusted "
                        "private network and set TTS_LOCKSTEP_TOKEN on all "
                        "processes (shared-token handshake)")
    s.set_defaults(fn=cmd_serve)

    dv = sub.add_parser("devices", help="device visibility check")
    dv.set_defaults(fn=cmd_devices)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
