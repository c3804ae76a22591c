"""Write a synthetic FULL-GEOMETRY HF checkpoint to disk (VERDICT r3 #5).

No released Orpheus weights are downloadable in this sandbox, but the
production boot path (sharded-safetensors load → quantize → warmup → first
request) must be exercised at FULL 3B dims — the tiny fixtures cannot catch
full-size layout, OOM, or load-time issues. This tool streams a
real-structure checkpoint shard by shard (never holding the full model in
RAM): config.json + model-0000x-of-0000N.safetensors + index json +
tokenizer.json (genuine BPE via tokenizer_fixture), matching exactly what
`models/loader.load_llama_checkpoint` ingests (reference workflow:
`tensorrt_tts/build_engine.py:84-94` snapshot_download → engine build).

Usage:
    python -m tts_inference_tpu.tools.make_checkpoint --out /ckpts/o3b
    python -m tts_inference_tpu.tools.make_checkpoint --out /tmp/t --tiny

Then the boot anatomy (PERF.md boot-budget rows):
    python -m tts_inference_tpu.cli quantize --model-path /ckpts/o3b \
        --out /ckpts/o3b-i8
    python -m tts_inference_tpu.cli generate --model-path /ckpts/o3b-i8 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List

import numpy as np


def _bf16(rng: np.random.Generator, shape, scale: float):
    import ml_dtypes

    a = rng.standard_normal(size=shape, dtype=np.float32) * scale
    return a.astype(ml_dtypes.bfloat16)


def _ones_bf16(n: int):
    import ml_dtypes

    return np.ones(n, np.float32).astype(ml_dtypes.bfloat16)


def write_checkpoint(out: str, cfg=None, *, seed: int = 0,
                     shard_bytes: int = 2 << 30) -> Dict:
    """Stream an HF-layout LlamaForCausalLM checkpoint to `out`."""
    from safetensors.numpy import save_file

    from tts_inference_tpu.config import ModelConfig

    cfg = cfg or ModelConfig()
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    h, kv, hd = cfg.hidden_size, cfg.num_key_value_heads, cfg.head_dim
    q_out = cfg.num_attention_heads * hd
    kv_out = kv * hd
    sc = 1.0 / np.sqrt(h)

    def tensors():
        # HF layout: linears stored (out, in)
        yield "model.embed_tokens.weight", lambda: _bf16(
            rng, (cfg.vocab_size, h), 0.02)
        for i in range(cfg.num_hidden_layers):
            b = f"model.layers.{i}"
            yield f"{b}.input_layernorm.weight", lambda: _ones_bf16(h)
            yield f"{b}.post_attention_layernorm.weight", \
                lambda: _ones_bf16(h)
            yield f"{b}.self_attn.q_proj.weight", lambda: _bf16(
                rng, (q_out, h), sc)
            yield f"{b}.self_attn.k_proj.weight", lambda: _bf16(
                rng, (kv_out, h), sc)
            yield f"{b}.self_attn.v_proj.weight", lambda: _bf16(
                rng, (kv_out, h), sc)
            yield f"{b}.self_attn.o_proj.weight", lambda: _bf16(
                rng, (h, q_out), sc)
            yield f"{b}.mlp.gate_proj.weight", lambda: _bf16(
                rng, (cfg.intermediate_size, h), sc)
            yield f"{b}.mlp.up_proj.weight", lambda: _bf16(
                rng, (cfg.intermediate_size, h), sc)
            yield f"{b}.mlp.down_proj.weight", lambda: _bf16(
                rng, (h, cfg.intermediate_size),
                1.0 / np.sqrt(cfg.intermediate_size))
        yield "model.norm.weight", lambda: _ones_bf16(h)

    # stream into ~shard_bytes shards (the multi-file layout real 3B
    # checkpoints ship)
    shards: List[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    weight_map: Dict[str, str] = {}
    order: List[str] = []
    for name, make in tensors():
        a = make()
        if sizes[-1] and sizes[-1] + a.nbytes > shard_bytes:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = a
        sizes[-1] += a.nbytes
        order.append(name)
    n = len(shards)
    total = 0
    for i, shard in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(out, fname))
        for k in shard:
            weight_map[k] = fname
        total += sizes[i]
        shard.clear()       # free as we go
    with open(os.path.join(out, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f)
    rs = None
    if cfg.rope_scaling_factor:
        rs = {"rope_type": "llama3", "factor": cfg.rope_scaling_factor,
              "low_freq_factor": cfg.rope_low_freq_factor,
              "high_freq_factor": cfg.rope_high_freq_factor,
              "original_max_position_embeddings":
                  cfg.rope_original_max_position}
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({
            "architectures": ["LlamaForCausalLM"],
            "model_type": "llama",
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_hidden_layers,
            "num_attention_heads": cfg.num_attention_heads,
            "num_key_value_heads": cfg.num_key_value_heads,
            "head_dim": cfg.head_dim,
            "rms_norm_eps": cfg.rms_norm_eps,
            "rope_theta": cfg.rope_theta,
            "rope_scaling": rs,
            "max_position_embeddings": cfg.max_position_embeddings,
            "tie_word_embeddings": cfg.tie_word_embeddings,
            "torch_dtype": "bfloat16",
        }, f, indent=2)
    from tts_inference_tpu.tools.tokenizer_fixture import write_tiny_tokenizer

    write_tiny_tokenizer(out)
    return {"out": out, "shards": n, "bytes": total,
            "tensors": len(order)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims with the real vocab (CI)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard-mb", type=int, default=2048)
    args = ap.parse_args(argv)
    cfg = None
    if args.tiny:
        from tts_inference_tpu.config import ModelConfig

        cfg = ModelConfig.tiny(vocab_size=156940)
    t0 = time.perf_counter()
    info = write_checkpoint(args.out, cfg, seed=args.seed,
                            shard_bytes=args.shard_mb << 20)
    info["wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(info))
    return 0


if __name__ == "__main__":
    sys.exit(main())
