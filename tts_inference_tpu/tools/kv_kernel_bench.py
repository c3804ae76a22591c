"""Op-level paged decode-attention bench: fp16 vs int8 vs int4 pools.

Measures ONE layer's paged GQA decode attention at serving shapes, using
the repo's kernel-timing rule (PERF.md): ≥2000 device-side reps chained
through a lax.scan inside ONE jit call (the attention output feeds the
next step's query, so steps serialize), forced scalar fetch at the end —
the ~25–55 ms axon-tunnel round-trip amortizes away.

Target shapes (PERF.md round-3):
  --b 64 --wb 4    the 64-active-slot regime (W = 512)
  --b 4  --wb 96   the long-audio 12k-token engine class (W = 12288)

Usage: python -m tts_inference_tpu.tools.kv_kernel_bench --b 64 --wb 4
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(run, q0, iters=3):
    run(q0).block_until_ready()           # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(q0))                    # forced scalar fetch
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64, help="batch (slots)")
    ap.add_argument("--wb", type=int, default=4, help="window blocks")
    ap.add_argument("--bs", type=int, default=128, help="block size")
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--g", type=int, default=3, help="query heads per kv")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2000)
    ap.add_argument("--skip-fp", action="store_true")
    args = ap.parse_args()

    from tts_inference_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_int8)
    from tts_inference_tpu.ops.pallas.paged_attention_int4 import (
        paged_decode_attention_int4, quantize_kv_int4, scales_to_planes)

    b, wb, bs, hkv, g, d = args.b, args.wb, args.bs, args.hkv, args.g, args.d
    n_blocks = b * wb + 1
    rng = np.random.default_rng(0)
    # head-batched pool layout (N, Hkv, bs, D)
    kf = jnp.asarray(rng.normal(size=(n_blocks, hkv, bs, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(n_blocks, hkv, bs, d)), jnp.bfloat16)
    table = jnp.asarray(
        np.arange(1, n_blocks).reshape(b, wb).astype(np.int32))
    pos = jnp.full((b,), wb * bs - 1, jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.bfloat16)

    def chained(fn, *rest):
        @functools.partial(jax.jit, static_argnames=())
        def run(q):
            def step(qc, _):
                return fn(qc, *rest).astype(qc.dtype), None
            qn, _ = jax.lax.scan(step, q, None, length=args.reps)
            return qn[0, 0, 0, 0].astype(jnp.float32)
        return run

    window_kb = wb * bs * hkv * d
    results = {}

    if not args.skip_fp:
        t = _timed(chained(paged_decode_attention, kf, vf, table, pos), q0)
        results["bf16"] = t / args.reps
    # int8 pools: per-(block, head, pos) scales — (N, Hkv, bs) directly
    sc = jnp.max(jnp.abs(kf.astype(jnp.float32)), -1) / 127.0
    k8 = jnp.clip(jnp.round(kf.astype(jnp.float32) / sc[..., None]),
                  -127, 127).astype(jnp.int8)
    scv = jnp.max(jnp.abs(vf.astype(jnp.float32)), -1) / 127.0
    v8 = jnp.clip(jnp.round(vf.astype(jnp.float32) / scv[..., None]),
                  -127, 127).astype(jnp.int8)
    t = _timed(chained(paged_decode_attention_int8, k8, v8, sc, scv,
                       table, pos), q0)
    results["int8"] = t / args.reps
    # int4 pools: quantize in natural (pos, head) layout, then rearrange
    # to pair-batched (N, P2, bs, D) + nibble-plane (N, 2, P2, bs) scales
    k4n, k4sn = quantize_kv_int4(jnp.moveaxis(kf, 1, 2))
    v4n, v4sn = quantize_kv_int4(jnp.moveaxis(vf, 1, 2))
    k4 = jnp.moveaxis(k4n, 1, 2)
    v4 = jnp.moveaxis(v4n, 1, 2)
    k4s = jnp.moveaxis(scales_to_planes(k4sn), 1, 3)
    v4s = jnp.moveaxis(scales_to_planes(v4sn), 1, 3)
    t = _timed(chained(paged_decode_attention_int4, k4, v4, k4s, v4s,
                       table, pos), q0)
    results["int4"] = t / args.reps

    print(f"shape: B={b} W={wb * bs} Hkv={hkv} G={g} D={d} "
          f"(window {window_kb // 1024} K elems/slot-layer)")
    for name, sec in results.items():
        print(f"  {name:5s}: {sec * 1e6:9.1f} us/layer-step")
    if "int8" in results and "int4" in results:
        print(f"  int4 speedup vs int8: "
              f"{results['int8'] / results['int4']:.2f}x")


if __name__ == "__main__":
    main()
