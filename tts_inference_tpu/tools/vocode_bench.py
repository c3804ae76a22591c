"""Batched-vocoder device-time bench: the vocode half of the tick floor.

The 64-slot serving tick is LM decode + batched windowed vocode sharing
one device (PERF.md round-4 dispatch campaign). step_bench attributes
the LM half; this tool measures the vocode half at the exact (rows,
frames) bucket geometry the scheduler emits, so tick wall can be
decomposed into LM + vocode + dispatch residual with measured numbers
on both sides.

Methodology (the round-3 kernel-timing rule): dispatch `--iters` decode
calls back to back WITHOUT fetching between them — the device queue
pipelines them and the tunnel round-trip amortizes — then block on the
last output only. Wall / iters = device ms per batched vocode call.

Reference analog: the SNAC decode cost inside the reference's chunk
loop (`tensorrt_tts/inference.py:96-112` redistribute_codes → SNAC
decode); there it rides a dedicated CUDA device, here it shares the
single TPU with the LM.

Usage:
    python -m tts_inference_tpu.tools.vocode_bench --rows 64 --frames 16
    python -m tts_inference_tpu.tools.vocode_bench --tiny --cpu  # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64,
                    help="batched vocode rows (streams chunking this tick)")
    ap.add_argument("--frames", type=int, default=16,
                    help="frames per window (bucketed internally)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="cfg.dtype=bfloat16 (the throughput option)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tts_inference_tpu.config import tiny_config
    from tts_inference_tpu.models import snac

    import dataclasses

    if args.tiny:
        cfg = tiny_config().snac
    else:
        cfg = snac.SnacConfig()
    if args.bf16:
        cfg = dataclasses.replace(cfg, dtype="bfloat16")
    params = snac.init_snac_params_fast(jax.random.PRNGKey(0), cfg)
    dec = snac.SnacDecoder(params, cfg)

    rng = np.random.default_rng(0)
    n = args.frames
    layers = [
        (rng.integers(0, 4096, (n,), dtype=np.int32),
         rng.integers(0, 4096, (2 * n,), dtype=np.int32),
         rng.integers(0, 4096, (4 * n,), dtype=np.int32))
        for _ in range(args.rows)
    ]
    first = [0] * args.rows
    seeds = list(range(args.rows))

    # cold call compiles; second call confirms cache
    h = dec.decode_frames_batch_launch(layers, first_frames=first,
                                       noise_seeds=seeds)
    dec.decode_frames_batch_fetch(h)

    t0 = time.perf_counter()
    handles = [
        dec.decode_frames_batch_launch(layers, first_frames=first,
                                       noise_seeds=seeds)
        for _ in range(args.iters)
    ]
    dec.decode_frames_batch_fetch(handles[-1])
    wall = time.perf_counter() - t0

    ms = wall / args.iters * 1000.0
    nb = dec.bucket_frames(n)
    rb = 1
    while rb < args.rows:
        rb *= 2
    audio_s = args.rows * n * cfg.samples_per_frame / cfg.sampling_rate
    print(json.dumps({
        "rows": args.rows, "frames": n, "dtype": cfg.dtype,
        "bucket": [rb, nb],
        "ms_per_call": round(ms, 2),
        "emitted_audio_s_per_call": round(audio_s, 3),
        "device_rtf": round(audio_s / (ms / 1000.0), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
