"""bf16-vocoder fidelity bound: same codes, f32 vs bf16 conv stack.

`--vocoder-bf16` (SnacConfig.dtype="bfloat16") is a measured throughput
lever (PERF.md round-5 saturation model: 1.75x faster at the 64-row
burst). Before it can be recommended anywhere, its audio error must be
bounded the way the reference bounds its streaming-vs-batch error
(MSE < 1e-3, max |diff| < 0.5, corr > 0.998, std-ratio > 0.95 —
reference: tensorrt_tts/PIPELINE_REPORT.md:513-519). This tool decodes
the SAME fixed-seed codes through the full-geometry decoder in float32
and bfloat16 and reports those four metrics waveform-to-waveform.

Like tools/quant_ladder.py this runs on fixed-seed random weights (no
released checkpoint is downloadable here), so the numbers bound the
RELATIVE dtype error of the conv arithmetic, not absolute perceptual
quality; re-run on real weights before changing any default.

Usage:
    python -m tts_inference_tpu.tools.vocoder_dtype_fidelity           # chip
    python -m tts_inference_tpu.tools.vocoder_dtype_fidelity --tiny --cpu
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tts_inference_tpu.config import SnacConfig, tiny_config
    from tts_inference_tpu.models import snac as snac_lib

    cfg = tiny_config().snac if args.tiny else SnacConfig()
    params = snac_lib.init_snac_params_fast(jax.random.PRNGKey(args.seed),
                                            cfg)
    rng = np.random.default_rng(args.seed)
    n_lat = args.frames * 4          # one 7-code frame = 4 latent steps
    codes = [
        rng.integers(0, cfg.codebook_size,
                     size=(args.batch, n_lat // s)).astype(np.int32)
        for s in cfg.vq_strides
    ]

    outs = {}
    for dtype in ("float32", "bfloat16"):
        dec = snac_lib.SnacDecoder(params,
                                   dataclasses.replace(cfg, dtype=dtype))
        import jax.numpy as jnp

        wav = dec._decode(dec.params, dec.cfg,
                          [jnp.asarray(c) for c in codes], noise_seed=0)
        outs[dtype] = np.asarray(wav, np.float64).ravel()

    a, b = outs["float32"], outs["bfloat16"]
    mse = float(np.mean((a - b) ** 2))
    corr = float(np.corrcoef(a, b)[0, 1])
    report = {
        "geometry": "tiny" if args.tiny else "full",
        "frames": args.frames,
        "batch": args.batch,
        "mse": mse,
        "max_diff": float(np.max(np.abs(a - b))),
        "corr": corr,
        "std_ratio": float(np.std(b) / np.std(a)),
        "thresholds": {"mse": 1e-3, "max_diff": 0.5,
                       "corr": 0.998, "std_ratio": 0.95},
    }
    report["pass"] = bool(
        mse < 1e-3 and report["max_diff"] < 0.5
        and corr > 0.998 and 0.95 < report["std_ratio"] < 1.0 / 0.95
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
