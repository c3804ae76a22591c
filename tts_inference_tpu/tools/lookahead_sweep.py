"""Lookahead ablation: streaming-vs-batch quality at 0/2/5/10/20 frames.

The reference's central tuning experiment (spec.md:38-44,
PIPELINE_REPORT.md:488-494: 0→MSE 3.66e-4/corr 0.977; 5→1.62e-5/0.999
chosen). Our windowed decoder with deterministic noise is bit-exact from
lookahead≥3, which this tool demonstrates; at 0–2 it quantifies the edge
error exactly like the reference did.

    python -m tts_inference_tpu.tools.lookahead_sweep --tiny --frames 40
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, Sequence

import numpy as np

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import StreamConfig
from tts_inference_tpu.models.snac import SnacDecoder
from tts_inference_tpu.streaming.lookahead import LookaheadStreamingDecoder


def quality_stats(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """The reference's streaming-quality metric set
    (PIPELINE_REPORT.md:513-519)."""
    n = min(len(a), len(b))
    a, b = a[:n].astype(np.float64), b[:n].astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    corr = float(np.corrcoef(a, b)[0, 1]) if a.std() > 0 and b.std() > 0 else 0.0
    return {
        "mse": mse,
        "correlation": corr,
        "max_diff": float(np.abs(a - b).max()),
        "std_ratio": float(a.std() / b.std()) if b.std() > 0 else 0.0,
        "pass": mse < 1e-3 and corr > 0.998
        and float(np.abs(a - b).max()) < 0.5
        and (b.std() == 0 or 0.95 < a.std() / b.std()),
    }


def sweep(
    decoder: SnacDecoder,
    codes: Sequence[int],
    lookaheads=(0, 2, 3, 5, 10, 20),
    frames_per_chunk: int = 5,
    left_context: int = 16,
    noise_seed: int = 0,
) -> Dict[int, Dict[str, float]]:
    l1, l2, l3 = P.deinterleave_frames(np.asarray(codes, np.int32))
    batch = decoder.decode_frames(l1, l2, l3, noise_seed=noise_seed,
                                  first_frame=0)
    out: Dict[int, Dict[str, float]] = {}
    for la in lookaheads:
        dec = LookaheadStreamingDecoder(
            decoder,
            StreamConfig(frames_per_chunk=frames_per_chunk,
                         lookahead_frames=la,
                         left_context_frames=left_context),
            noise_seed=noise_seed,
        )
        chunks = []
        for i in range(0, len(codes), P.FRAME_SIZE):
            dec.feed(codes[i : i + P.FRAME_SIZE])
            got = dec.poll()
            if got is not None:
                chunks.append(got)
        tail = dec.flush()
        if tail is not None:
            chunks.append(tail)
        stream = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        stats = quality_stats(stream, batch)
        stats["added_latency_ms"] = la * P.FRAME_MS
        out[la] = stats
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random vocoder (no assets)")
    ap.add_argument("--snac-path", help="real SNAC checkpoint dir")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tts_inference_tpu.config import SnacConfig
    from tts_inference_tpu.models import snac

    if args.snac_path:
        from tts_inference_tpu.models.loader import load_snac_checkpoint

        params, cfg = load_snac_checkpoint(args.snac_path)
    else:
        cfg = (SnacConfig(latent_dim=32, decoder_dim=64, codebook_dim=4)
               if args.tiny else SnacConfig())
        params = snac.init_snac_params(jax.random.PRNGKey(args.seed), cfg)
    decoder = snac.SnacDecoder(params, cfg)

    rng = np.random.default_rng(args.seed)
    codes = []
    for _ in range(args.frames):
        for p in range(P.FRAME_SIZE):
            codes.append(int(rng.integers(0, cfg.codebook_size))
                         + P.POSITION_OFFSETS[p])
    table = sweep(decoder, codes)
    print(json.dumps({str(k): v for k, v in table.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
