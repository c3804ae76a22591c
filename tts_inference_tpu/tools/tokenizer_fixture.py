"""Build a small REAL byte-level-BPE tokenizer fixture (tokenizer.json).

The reference always runs a true HF BPE tokenizer (Llama-3's, via
`AutoTokenizer` — `vllm_inference/modal_audio_stream.py:244-269`), so real
prompts land at ~1.3 tokens/word. Our offline test/bench default,
`ByteTokenizer`, costs ~5× the ids (1/byte) which inflates the prefill
bucket and therefore TTFA (PERF.md attributes ~27 ms of the round-2 TTFA
gap to the 128-token bucket a byte-tokenized prompt forces).

This module trains a tiny but REAL BPE (the same `tokenizers` machinery HF
uses, byte-level alphabet so any UTF-8 input round-trips) on the benchmark
prompt corpus and writes a loadable HF tokenizer dir:

    python -m tts_inference_tpu.tools.tokenizer_fixture --out /tmp/tok
    python -m tts_inference_tpu.cli generate --tokenizer-path /tmp/tok ...

Tests use it to exercise the `HFTokenizer` product path (round-2 verdict:
every bench/test used ByteTokenizer; the real path was untested).

All ids stay < 16384, far below the protocol special range (≥128256), so
protocol invariants hold exactly as with the real Llama tokenizer.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional

# A small English corpus shaped like TTS traffic: the benchmark sweep
# sentences plus voice-prefixed variants (the serving wire format is
# "{voice}: {text}", protocol.format_prompt).
_EXTRA = [
    "Hello there, how are you doing today?",
    "The quick brown fox jumps over the lazy dog.",
    "Please speak this sentence aloud in a natural voice.",
    "Streaming text to speech with low latency is the goal.",
    "This is a short test of the emergency broadcast system.",
    "Numbers like one, two, three, and four are common.",
    "We will measure the time to first audio very carefully.",
]
_VOICES = ["tara", "zac", "zoe", "jess", "leo", "mia", "julia", "leah"]


def _corpus() -> Iterable[str]:
    texts = list(_EXTRA)
    try:  # benchmark sweep prompts when available (repo checkout)
        from benchmarks.prompts import SWEEP_PROMPTS

        texts += [t for _, t in SWEEP_PROMPTS]
    except Exception:
        pass
    for t in texts:
        yield t
        for v in _VOICES:
            yield f"{v}: {t}"


def write_tiny_tokenizer(
    out_dir: str,
    vocab_size: int = 2048,
    corpus: Optional[Iterable[str]] = None,
) -> str:
    """Train + write a real byte-level-BPE tokenizer dir; returns out_dir."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[],
        show_progress=False,
    )
    tok.train_from_iterator(corpus or _corpus(), trainer)

    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "model_max_length": 131072,
                "clean_up_tokenization_spaces": False,
            },
            f,
            indent=2,
        )
    return out_dir


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output tokenizer dir")
    ap.add_argument("--vocab-size", type=int, default=2048)
    args = ap.parse_args(argv)
    write_tiny_tokenizer(args.out, args.vocab_size)
    # quick self-check: real compression vs bytes, exact round-trip
    from tts_inference_tpu.utils.tokenizer import HFTokenizer

    t = HFTokenizer(args.out)
    s = "tara: Hello there, how are you doing today?"
    ids = t.encode(s)
    print(json.dumps({
        "out": args.out,
        "sample": s,
        "n_tokens": len(ids),
        "n_bytes": len(s.encode()),
        "roundtrip_exact": t.decode(ids) == s,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
