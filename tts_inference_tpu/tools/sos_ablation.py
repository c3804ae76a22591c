"""SOS-pattern ablation: decode first-SOS vs last-SOS extraction for A/B.

Counterpart of helpers/analyze_sos_pattern.py (find all SOS/EOS/DELIMITER
positions :154-160; decode each extraction strategy and save WAVs for human
A/B :190-301). Works from a token dump (e.g. `cli dump-tokens` output).

    python -m tts_inference_tpu.tools.sos_ablation --tokens-json dump.json \
        --tiny --out-dir abl_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Sequence

import numpy as np

from tts_inference_tpu import protocol as P
from tts_inference_tpu.tools.analyze_tokens import audio_sanity, census
from tts_inference_tpu.utils.audio import write_wav

STRATEGIES = ("first_sos", "last_sos")


def ablate(
    decoder, token_ids: Sequence[int], out_dir: str, noise_seed: int = 0
) -> Dict[str, Dict]:
    os.makedirs(out_dir, exist_ok=True)
    report: Dict[str, Dict] = {"census": census(token_ids)}
    for strategy in STRATEGIES:
        codes = P.extract_audio_codes(token_ids, strategy=strategy)
        n = len(codes) // P.FRAME_SIZE
        entry: Dict = {"codes": len(codes), "frames": n}
        if n:
            l1, l2, l3 = P.deinterleave_frames(np.asarray(codes, np.int32))
            audio = decoder.decode_frames(
                l1, l2, l3, noise_seed=noise_seed, first_frame=0
            )
            path = os.path.join(out_dir, f"ablation_{strategy}.wav")
            write_wav(path, np.clip(
                audio * 32767, -32768, 32767
            ).astype(np.int16).tobytes())
            entry["wav"] = path
            entry.update(audio_sanity(audio))
        report[strategy] = entry
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens-json", required=True)
    ap.add_argument("--out-dir", default="ablation_out")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--snac-path")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
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

    data = json.load(
        sys.stdin if args.tokens_json == "-" else open(args.tokens_json)
    )
    ids = data["token_ids"] if isinstance(data, dict) else data
    print(json.dumps(ablate(decoder, ids, args.out_dir), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
