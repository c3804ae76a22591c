"""Decode-STEP attribution bench: where does the B=64 step's time go?

PERF.md round-3 close: the 64-slot serving tick is 98% device decode at
~18 ms/step, of which the paged-attention kernel campaign accounts for
~5 ms — this tool attributes the rest. It times, with the repo's
kernel-timing rule (many device-side reps chained through lax.scan inside
ONE jit call + forced scalar fetch, so the axon-tunnel round-trip
amortizes away):

  full       the PRODUCT decode step — EngineCore._decode at a fixed KV
             window (engine/engine.py:246), n steps per dispatch
  matmuls    the 7 per-layer weight matmuls alone (q/k/v/o/gate/up/down,
             real QuantLinear leaves, carry-chained)
  attention  N x the paged decode-attention kernel at the serving window
  head+sample  sliced-head logits + the full sampling chain
  kv_write   N x the paged pool scatter (K, V, + scale planes)

residual = full − (components): rope, norms, embeds, elementwise, and
XLA scheduling gaps. Components are measured on standalone arrays at the
exact serving shapes, so they can be re-run in isolation while the engine
holds the chip's HBM only once. Results print incrementally (one JSON
line per component) and failures in one component don't lose the rest —
the remote-compile tunnel can drop large graphs (use --layers 7 there).

Usage (the 64-slot regime, PERF.md):
  python -m tts_inference_tpu.tools.step_bench --batch 64 --window 512 \
      --quantize --paged-kv --kv-int8 --layers 7
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback


def _timed(run, iters, *args):
    run(*args).block_until_ready()          # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))                   # forced scalar fetch
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--window", type=int, default=512,
                    help="KV attention window (kv_bucket at serving depth)")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--weight-bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--paged-kv", action="store_true")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--kv-int4", action="store_true")
    ap.add_argument("--steps", type=int, default=112,
                    help="decode steps per dispatch for the full-step chain")
    ap.add_argument("--reps", type=int, default=200,
                    help="scan reps for the component chains")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--layers", type=int, default=0,
                    help="component chains run this many layers per step "
                         "and scale the report by num_layers/this (smaller "
                         "graphs — the remote-compile tunnel can drop the "
                         "full 28-layer matmul chain); 0 = all layers")
    ap.add_argument("--skip", default="",
                    help="comma-separated components to skip "
                         "(full,matmuls,attention,sample,write)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_inference_tpu.config import Config, SamplingConfig, tiny_config
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.models.quant import mm
    from tts_inference_tpu.ops import sampling as S
    from tts_inference_tpu.runtime import enable_compilation_cache

    enable_compilation_cache(None)
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    cfg = tiny_config() if args.tiny else Config()
    if not args.tiny:
        # bench.py's concurrent serving geometry (dense 64-slot pools at the
        # default 4608 max_seq exceed one chip's HBM)
        cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
            cfg.engine, max_input_len=128, max_output_len=2048))
    max_seq = cfg.engine.max_input_len + cfg.engine.max_output_len
    blk = next(b for b in (128, 64, 32, 16) if max_seq % b == 0)
    cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
        cfg.engine, paged_kv=args.paged_kv,
        kv_cache_int8=args.kv_int8, kv_cache_int4=args.kv_int4,
        kv_block_size=blk if args.paged_kv else cfg.engine.kv_block_size,
        kv_pool_tokens=(args.batch + 1) * max_seq
        if args.paged_kv else cfg.engine.kv_pool_tokens))
    mc, b = cfg.model, args.batch
    window = min(args.window, max_seq)
    hd, nq, nkv = mc.head_dim, mc.num_attention_heads, mc.num_key_value_heads
    hsz, nl = mc.hidden_size, mc.num_hidden_layers
    nl_run = min(args.layers or nl, nl)
    scale_l = nl / nl_run

    params = llama.init_llama_params(jax.random.PRNGKey(0), mc)
    if args.quantize:
        from tts_inference_tpu.models.quant import quantize_llama_params

        params = quantize_llama_params(params, bits=args.weight_bits)
    core = EngineCore(params, mc, cfg.engine, batch_size=b)
    sp = S.SamplingParams.from_config(SamplingConfig(), b)
    # prefill to just under the window so decode attends at the full window
    plen = min(max(window - 16, 8), cfg.engine.max_input_len)
    tok = core.prefill_slots([[1] * plen] * b, list(range(b)), sp)
    act = np.ones(b, bool)
    tok_d = jnp.asarray(tok[:, 0] if tok.ndim > 1 else tok, jnp.int32)
    act_d = jnp.asarray(act)

    report = {"batch": b, "window": window, "steps": args.steps,
              "component_layers": nl_run,
              "weights": f"int{args.weight_bits}" if args.quantize
              else "bf16",
              "kv": ("int4" if args.kv_int4 else
                     "int8" if args.kv_int8 else "bf16")
              + ("/paged" if args.paged_kv else "/dense")}

    def emit(key, value):
        report[key] = value
        print(json.dumps({key: value}), flush=True)

    def guarded(name, key, fn):
        if name in skip:
            return
        try:
            emit(key, fn())
        except Exception:
            traceback.print_exc()
            emit(key, None)

    # ---- full product step: EngineCore._decode at a FIXED window ----------
    def measure_full():
        def full():
            nonlocal tok_d, act_d
            toks, tok_d, act_d, core.cache, core.sampling_state = \
                core._decode(args.steps, window, core.params, core.cache,
                             core.sampling_state, sp, tok_d, act_d)
            return toks[0, 0].astype(jnp.float32)

        full()  # compile + warm (consumes cache depth — window is fixed)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(full())
            best = min(best, time.perf_counter() - t0)
        return round(best / args.steps * 1e6, 1)

    guarded("full", "full_us_per_step", measure_full)

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(b, hsz)) * 0.02, jnp.bfloat16)

    # ---- matmul chain: the 7 per-layer linears, carry-serialized ----------
    def measure_matmuls():
        # weights as jit ARGS, not closure constants — closed-over arrays
        # are serialized into the remote-compile request (HTTP 413)
        layers0 = core.params["layers"][:nl_run]

        @jax.jit
        def run_mm(h, layers):
            def step(x, _):
                for lp in layers:
                    q = mm(x, lp["wq"])
                    k = mm(x, lp["wk"])
                    v = mm(x, lp["wv"])
                    # keep k/v live (they are 2/7 of the weight bytes)
                    q = q.at[:, : k.shape[1]].add(k * 1e-6)
                    q = q.at[:, : v.shape[1]].add(v * 1e-6)
                    x = x + mm(q, lp["wo"]) * 1e-3
                    g = jax.nn.silu(
                        mm(x, lp["w_gate"]).astype(jnp.float32))
                    x = x + mm(
                        g.astype(x.dtype) * mm(x, lp["w_up"]), lp["w_down"]
                    ) * 1e-3
                    x = x * 0.5  # keep magnitudes bounded over many reps
                return x, None

            xn, _ = jax.lax.scan(step, h, None, length=args.reps)
            return xn[0, 0].astype(jnp.float32)

        t = _timed(run_mm, args.iters, h0, layers0)
        return round(t / args.reps * scale_l * 1e6, 1)

    guarded("matmuls", "matmuls_us_per_step", measure_matmuls)

    # ---- attention chain: nl x the serving attention at (window) ----------
    wb = max(window // blk, 1)
    n_blocks = b * wb + 1
    q0 = jnp.asarray(rng.normal(size=(b, nkv, nq // nkv, hd)), jnp.bfloat16)

    def measure_attention():
        if not (args.paged_kv and jax.default_backend() == "tpu"):
            return None   # dense/CPU: see kv_kernel_bench
        table = jnp.asarray(
            np.arange(1, n_blocks).reshape(b, wb).astype(np.int32))
        pos = jnp.full((b,), wb * blk - 1, jnp.int32)
        kf = jnp.asarray(rng.normal(size=(n_blocks, nkv, blk, hd)),
                         jnp.bfloat16)
        vf = jnp.asarray(rng.normal(size=(n_blocks, nkv, blk, hd)),
                         jnp.bfloat16)
        if args.kv_int4:
            from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
                paged_decode_attention_int4, quantize_kv_int4,
                scales_to_planes)

            k4n, k4s = quantize_kv_int4(jnp.moveaxis(kf, 1, 2))
            v4n, v4s = quantize_kv_int4(jnp.moveaxis(vf, 1, 2))
            kk = jnp.moveaxis(k4n, 1, 2)
            vv = jnp.moveaxis(v4n, 1, 2)
            ks = jnp.moveaxis(scales_to_planes(k4s), 1, 3)
            vs = jnp.moveaxis(scales_to_planes(v4s), 1, 3)

            def attn_fn(q):
                return paged_decode_attention_int4(
                    q, kk, vv, ks, vs, table, pos)
        elif args.kv_int8:
            from tts_inference_tpu.ops.pallas.paged_attention import (
                paged_decode_attention_int8)

            sck = jnp.max(jnp.abs(kf.astype(jnp.float32)), -1) / 127.0
            k8 = jnp.clip(
                jnp.round(kf.astype(jnp.float32) / sck[..., None]),
                -127, 127).astype(jnp.int8)
            scv = jnp.max(jnp.abs(vf.astype(jnp.float32)), -1) / 127.0
            v8 = jnp.clip(
                jnp.round(vf.astype(jnp.float32) / scv[..., None]),
                -127, 127).astype(jnp.int8)

            def attn_fn(q):
                return paged_decode_attention_int8(
                    q, k8, v8, sck, scv, table, pos)
        else:
            from tts_inference_tpu.ops.pallas.paged_attention import (
                paged_decode_attention)

            def attn_fn(q):
                return paged_decode_attention(q, kf, vf, table, pos)

        reps = max(args.reps // 8, 4)

        @jax.jit
        def run_attn(q):
            def step(qc, _):
                for _ in range(nl_run):
                    qc = attn_fn(qc).astype(qc.dtype)
                return qc, None

            qn, _ = jax.lax.scan(step, q, None, length=reps)
            return qn[0, 0, 0, 0].astype(jnp.float32)

        t = _timed(run_attn, args.iters, q0)
        return round(t / reps * scale_l * 1e6, 1)

    guarded("attention", "attention_us_per_step", measure_attention)

    # ---- head + sampling chain ---------------------------------------------
    def measure_sample():
        base = core.logits_base
        sstate0 = S.init_sampling_state(b, mc.vocab_size, 1)
        reps = max(args.reps // 4, 8)
        # head weights as a jit ARG (remote-compile 413, as above)
        head_p = {k: core.params[k] for k in ("embed", "lm_head")
                  if k in core.params}

        @jax.jit
        def run_sample(h, sstate, hp):
            def step(carry, _):
                hh, st = carry
                logits = llama.compute_logits(hp, mc, hh, base)
                t, st = S.sample(logits, sp, st, base=base)
                hh = h + (t[:, None] % 97).astype(h.dtype) * 1e-6
                return (hh, st), None

            (hn, _), _ = jax.lax.scan(
                step, (h, sstate), None, length=reps)
            return hn[0, 0].astype(jnp.float32)

        t = _timed(run_sample, args.iters, h0, sstate0, head_p)
        return round(t / reps * 1e6, 1)

    guarded("sample", "head_sample_us_per_step", measure_sample)

    # ---- kv_write chain: nl x paged pool scatter per step -------------------
    def measure_write():
        if not args.paged_kv:
            return None
        cache = core.cache
        kv_new = jnp.asarray(rng.normal(size=(b, 1, nkv, hd)), jnp.bfloat16)
        rows0 = jnp.asarray(
            np.arange(1, b + 1).astype(np.int32)[:, None])   # (B, 1)
        offs0 = jnp.zeros((b, 1), jnp.int32)

        # one layer's pool buffers, same shapes as the engine cache; the
        # scan carries (and thus donates) them so the scatter runs in place
        ck0 = jnp.zeros_like(cache.k[0])
        cv0 = jnp.zeros_like(cache.v[0])
        ks0 = jnp.zeros_like(cache.k_scale[0]) if cache.quantized else None
        vs0 = jnp.zeros_like(cache.v_scale[0]) if cache.quantized else None
        packed_i4 = args.kv_int4
        reps = max(args.reps // 4, 8)

        @jax.jit
        def run_write(ck, cv, ks, vs):
            def step(carry, i):
                ck, cv, ks, vs = carry
                offs = offs0 + (i % blk)
                if packed_i4:
                    from tts_inference_tpu.ops.pallas.paged_attention_int4 \
                        import quantize_kv_int4, scales_to_planes

                    kq, k_sc = quantize_kv_int4(kv_new)
                    for _ in range(nl_run):
                        ck = llama.pool_scatter(ck, rows0, offs, kq)
                        cv = llama.pool_scatter(cv, rows0, offs, kq)
                        ks = llama.pool_scatter(
                            ks, rows0, offs, scales_to_planes(k_sc),
                            n_mid=2)
                        vs = llama.pool_scatter(
                            vs, rows0, offs, scales_to_planes(k_sc),
                            n_mid=2)
                elif ks is not None:
                    kq, k_sc = llama._quantize_kv(kv_new)
                    for _ in range(nl_run):
                        ck = llama.pool_scatter(ck, rows0, offs, kq)
                        cv = llama.pool_scatter(cv, rows0, offs, kq)
                        ks = llama.pool_scatter(ks, rows0, offs, k_sc)
                        vs = llama.pool_scatter(vs, rows0, offs, k_sc)
                else:
                    for _ in range(nl_run):
                        ck = llama.pool_scatter(
                            ck, rows0, offs, kv_new.astype(ck.dtype))
                        cv = llama.pool_scatter(
                            cv, rows0, offs, kv_new.astype(cv.dtype))
                return (ck, cv, ks, vs), None

            (ck, cv, ks, vs), _ = jax.lax.scan(
                step, (ck, cv, ks, vs), jnp.arange(reps))
            return ck.reshape(-1)[0].astype(jnp.float32)

        t = _timed(run_write, args.iters, ck0, cv0, ks0, vs0)
        return round(t / reps * scale_l * 1e6, 1)

    guarded("write", "kv_write_us_per_step", measure_write)

    parts = [report[k] for k in (
        "matmuls_us_per_step", "attention_us_per_step",
        "head_sample_us_per_step", "kv_write_us_per_step")
        if report.get(k)]
    if report.get("full_us_per_step") and parts:
        report["residual_us_per_step"] = round(
            report["full_us_per_step"] - sum(parts), 1)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
