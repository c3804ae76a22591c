"""Quantization quality ladder in AUDIO space (VERDICT r3 #3).

The reference's quality contract is waveform metrics with hard thresholds
(MSE < 1e-3, max-diff < 0.5, corr > 0.998 — `tensorrt_tts/
PIPELINE_REPORT.md:513-519`), used there for streaming-vs-batch. This tool
applies the same metric set to the QUANTIZATION ladder: identical seeds and
prompts through bf16 / int8 / int4(g512) / int4(g128) [/ +quantized KV]
end-to-end (engine → vocoder), reporting per config:

- waveform MSE / max-diff / corr / std-ratio vs the bf16 run (free-running
  generation: a single token flip cascades, so these numbers bound the
  BEHAVIORAL divergence, not just numeric error);
- token agreement: fraction of matching tokens + first-divergence index;
- teacher-forced next-token agreement: bf16's own token sequence pushed
  through each quantized model's prefill — what fraction of positions pick
  the same argmax token, plus logit rel-RMS. This isolates numeric error
  from cascade effects and is the number that transfers to real weights.

No released checkpoints exist in this sandbox, so weights are synthetic —
run with --full-geometry on a chip for the 3B-shape table (PERF.md), or
--tiny --cpu in CI (tests/test_quant_ladder.py). On real weights, rerun
with --model-path; MIGRATION.md's int4 guidance follows this table.

Usage:
    python -m tts_inference_tpu.tools.quant_ladder --tiny --cpu
    python -m tts_inference_tpu.tools.quant_ladder --full-geometry \
        --tokens 420 --utterances 3 --out ladder.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from typing import Dict, List, Optional

import numpy as np


LADDER = (
    # (name, dict(quantize=, weight_bits=, group=, kv_int8=, kv_int4=))
    ("bf16", dict(quantize=False)),
    ("int8", dict(quantize=True, weight_bits=8)),
    ("int8+kv8", dict(quantize=True, weight_bits=8, kv_int8=True)),
    ("int4_g512", dict(quantize=True, weight_bits=4, group=512)),
    ("int4_g128", dict(quantize=True, weight_bits=4, group=128)),
)

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Nadi ke kinare ek chhota sa gaon tha.",
    "Streaming synthesis must hold its cadence for minutes.",
]


def _build(cfg_over: Dict, *, tiny: bool, seed: int, tokens: int):
    """One runtime of the ladder rung. Params are re-init'd from the SAME
    seed every time, then quantized per rung — the bf16 tree is the common
    ancestor of every comparison."""
    import dataclasses as dc

    from tts_inference_tpu.config import Config, tiny_config
    from tts_inference_tpu.runtime import Runtime

    cfg = tiny_config() if tiny else Config()
    eng = dc.replace(
        cfg.engine,
        max_input_len=64 if tiny else 128,
        max_output_len=max(tokens + 32, 128),
        # full geometry keeps the bench-single batch (8) so the chip run
        # reuses the persistent XLA cache instead of compiling a fresh
        # batch-1 graph matrix per rung
        max_batch_size=8 if not tiny else cfg.engine.max_batch_size,
        kv_cache_int8=bool(cfg_over.get("kv_int8")),
        kv_cache_int4=bool(cfg_over.get("kv_int4")),
        paged_kv=bool(cfg_over.get("kv_int4")),   # int4 KV requires paged
    )
    cfg = dc.replace(cfg, engine=eng)
    import os

    if cfg_over.get("group"):
        os.environ["TTS_INT4_GROUP"] = str(cfg_over["group"])
    try:
        rt = Runtime.create(
            cfg, seed=seed, warmup=False,
            quantize=bool(cfg_over.get("quantize")),
            weight_bits=int(cfg_over.get("weight_bits", 8)),
        )
    finally:
        os.environ.pop("TTS_INT4_GROUP", None)
    return rt


def _gen_tokens(rt, text: str, tokens: int, seed: int) -> List[int]:
    from tts_inference_tpu import protocol
    from tts_inference_tpu.config import SamplingConfig

    prompt = rt.pipeline.build_prompt(text, "tara", force_speech=True)
    # audio-only constrained greedy (the cli --audio-only structured mode):
    # every rung emits in-range audio tokens, so quantization divergence
    # shows up as different codes — comparable waveforms — never as an
    # undecodable stream
    sampling = SamplingConfig(
        greedy=True, max_tokens=tokens, seed=seed,
        token_range=(protocol.TOKEN_AUDIO_BASE,
                     protocol.TOKEN_AUDIO_BASE + protocol.AUDIO_VOCAB),
    )
    res = rt.engine.generate(prompt, sampling)
    return list(res.token_ids)


def _vocode(rt, token_ids: List[int], noise_seed: int = 0) -> np.ndarray:
    """Batch decode: extractor → deinterleave → full vocoder pass (float)."""
    from tts_inference_tpu import protocol

    ex = protocol.TokenExtractor()
    ex.started = True          # force_speech: SOS is in the prompt
    codes: List[int] = []
    for t in token_ids:
        codes.extend(ex.feed(int(t)))
    nf = len(codes) // protocol.FRAME_SIZE
    if nf == 0:
        return np.zeros(0, np.float32)
    codes = codes[: nf * protocol.FRAME_SIZE]
    l1, l2, l3 = protocol.deinterleave_frames(codes)
    return np.asarray(rt.vocoder.decode_frames(
        np.asarray(l1, np.int32), np.asarray(l2, np.int32),
        np.asarray(l3, np.int32), noise_seed=noise_seed,
    ), np.float32)


def _wave_metrics(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    n = min(len(a), len(b))
    if n == 0:
        return {"mse": float("nan"), "max_diff": float("nan"),
                "corr": 0.0, "std_ratio": 0.0, "len_ratio": 0.0}
    x, y = a[:n], b[:n]
    mse = float(np.mean((x - y) ** 2))
    mx = float(np.max(np.abs(x - y)))
    sx, sy = float(np.std(x)), float(np.std(y))
    corr = float(np.corrcoef(x, y)[0, 1]) if sx > 0 and sy > 0 else 0.0
    return {
        "mse": mse, "max_diff": mx, "corr": corr,
        "std_ratio": (min(sx, sy) / max(sx, sy)) if max(sx, sy) else 0.0,
        "len_ratio": min(len(a), len(b)) / max(len(a), len(b)),
    }


def _token_metrics(ref: List[int], got: List[int]) -> Dict[str, float]:
    n = min(len(ref), len(got))
    div = next((i for i in range(n) if ref[i] != got[i]), n)
    match = sum(1 for i in range(n) if ref[i] == got[i])
    return {
        "first_divergence": div if div < n or len(ref) != len(got) else -1,
        "token_match_frac": match / max(n, 1),
        "len_ref": len(ref), "len_got": len(got),
    }


def _tf_logits(rt, token_seq: List[int]) -> Optional[np.ndarray]:
    """Prefill logits for a fixed token sequence (teacher forcing)."""
    import jax.numpy as jnp

    from tts_inference_tpu.models import llama

    t = len(token_seq)
    if t < 8:
        return None
    toks = jnp.asarray(np.asarray(token_seq, np.int32)[None, :])
    plen = jnp.asarray([t], jnp.int32)
    cfg = rt.config.model
    cache = llama.init_kv_cache(cfg, 1, ((t + 127) // 128) * 128)
    lg, _ = llama.prefill(rt.engine.core.params, cfg, toks, plen, cache)
    return np.asarray(lg, np.float32)


def _teacher_forced(lg_q: Optional[np.ndarray],
                    lg_r: Optional[np.ndarray]) -> Dict[str, float]:
    """Compare a rung's teacher-forced logits against the cached bf16 ones
    (numpy — the bf16 RUNTIME is freed before any other rung boots; two
    full-geometry runtimes do not co-fit in HBM)."""
    if lg_q is None or lg_r is None:
        return {}
    if lg_q.ndim == 3:      # (1, T, V): per-position logits
        agree = float((lg_q[0].argmax(-1) == lg_r[0].argmax(-1)).mean())
    else:                   # (1, V): final-position logits only
        agree = float(lg_q[0].argmax() == lg_r[0].argmax())
    rms = float(np.sqrt(np.mean((lg_q - lg_r) ** 2))
                / (np.sqrt(np.mean(lg_r ** 2)) + 1e-9))
    return {"tf_argmax_agree": agree, "tf_logit_rel_rms": rms}


def run_ladder(*, tiny: bool, tokens: int, utterances: int, seed: int,
               rungs=LADDER) -> Dict:
    prompts = (PROMPTS * ((utterances + len(PROMPTS) - 1) // len(PROMPTS))
               )[:utterances]
    results: Dict[str, dict] = {}
    ref_tokens: List[List[int]] = []
    ref_waves: List[np.ndarray] = []
    ref_logits: Optional[np.ndarray] = None
    for name, over in rungs:
        t0 = time.perf_counter()
        rt = _build(over, tiny=tiny, seed=seed, tokens=tokens)
        per_utt = []
        for i, text in enumerate(prompts):
            tok = _gen_tokens(rt, text, tokens, seed=seed + i)
            wav = _vocode(rt, tok, noise_seed=seed + i)
            if name == "bf16":
                ref_tokens.append(tok)
                ref_waves.append(wav)
                per_utt.append({"tokens": len(tok),
                                "audio_s": len(wav) / 24000.0})
            else:
                m = _wave_metrics(ref_waves[i], wav)
                m.update(_token_metrics(ref_tokens[i], tok))
                per_utt.append(m)
        entry: dict = {"utterances": per_utt,
                       "build_s": round(time.perf_counter() - t0, 1)}
        if name == "bf16":
            # cache teacher-forcing logits as NUMPY and free the runtime —
            # two full-geometry runtimes do not co-fit in HBM
            ref_logits = _tf_logits(rt, ref_tokens[0])
        else:
            entry.update(_teacher_forced(
                _tf_logits(rt, ref_tokens[0]), ref_logits))
            # aggregate over utterances
            for k in ("mse", "max_diff", "corr", "token_match_frac"):
                entry[k] = round(float(np.median(
                    [u[k] for u in per_utt])), 6)
        results[name] = entry
        print(f"[ladder] {name}: {json.dumps({k: v for k, v in entry.items() if k != 'utterances'})}",
              file=sys.stderr, flush=True)
        del rt
        import gc

        gc.collect()
    return {"tokens": tokens, "utterances": utterances, "seed": seed,
            "tiny": tiny, "rungs": results}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full-geometry", action="store_true",
                    help="3B dims with synthetic weights (chip run)")
    ap.add_argument("--tokens", type=int, default=140)
    ap.add_argument("--utterances", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip", default="",
                    help="comma-separated rung names to skip")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    tiny = args.tiny or not args.full_geometry
    skip = {s for s in args.skip.split(",") if s}
    rungs = tuple((n, o) for n, o in LADDER if n not in skip)
    out = run_ladder(tiny=tiny, tokens=args.tokens,
                     utterances=args.utterances, seed=args.seed,
                     rungs=rungs)
    js = json.dumps(out, indent=2, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)
    print(js)
    return 0


if __name__ == "__main__":
    sys.exit(main())
