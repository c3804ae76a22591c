"""Fine-tune CLI: LoRA (or full) training loop with periodic sampling.

The reference training loop (`pretrained_base/modal_finetune_base.py`:
4-bit base + LoRA r=16 α=32, HF Trainer fp16, 100 steps, SamplingCallback
every 20 steps, save + push) redone TPU-first: jitted train step over an
optional (dp, tp) mesh, optax adamw + cosine schedule, orbax step
checkpoints, a greedy sample emitted every N steps, and a weight-space
merge command (`merge_and_unload` analog) producing a serving checkpoint.

    # tiny end-to-end demo (synthetic corpus, CPU)
    python -m tts_inference_tpu.training.finetune train --tiny --cpu \
        --steps 10 --out-dir /tmp/ft
    python -m tts_inference_tpu.training.finetune merge --tiny --cpu \
        --adapter-dir /tmp/ft --out-dir /tmp/merged
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _model_setup(args):
    import jax

    from tts_inference_tpu.config import Config, tiny_config
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.utils.tokenizer import load_tokenizer, ByteTokenizer

    cfg = tiny_config() if args.tiny else Config()
    if args.model_path:
        from tts_inference_tpu.models.loader import load_llama_checkpoint

        params, model_cfg = load_llama_checkpoint(args.model_path)
        import dataclasses

        cfg = dataclasses.replace(cfg, model=model_cfg)
        tokenizer = load_tokenizer(args.model_path)
    else:
        params = llama.init_llama_params(
            jax.random.PRNGKey(args.seed), cfg.model
        )
        tokenizer = ByteTokenizer()
    return cfg, params, tokenizer


def _records(args, rng):
    from tts_inference_tpu.training import data as D

    if args.dataset:
        import os

        if os.path.isdir(args.dataset):
            # HF-datasets on-disk dir (arrow/parquet) — the reference's
            # load_dataset path (modal_finetune_base.py:73)
            return D.load_dataset_dir(args.dataset)
        return D.load_jsonl(args.dataset)
    return D.synthetic_records(rng, n=args.synthetic_records)


def cmd_train(args) -> int:
    import jax
    import optax

    from tts_inference_tpu.training import data as D
    from tts_inference_tpu.training import lora as L
    from tts_inference_tpu.training.checkpoint import CheckpointManager, save_params
    from tts_inference_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    cfg, params, tokenizer = _model_setup(args)
    rng = np.random.default_rng(args.seed)
    records = _records(args, rng)

    # tag mining → vocab extension (reference: add_special_tokens + resize)
    tags = D.mine_tags([r["text"] for r in records])
    if tags and args.extend_vocab:
        params = D.extend_vocab(params, len(tags), seed=args.seed)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, vocab_size=cfg.model.vocab_size + len(tags)
            )
        )
        print(f"mined {len(tags)} tags, vocab extended to "
              f"{cfg.model.vocab_size}")

    scale = L.lora_scale(args.lora_r, args.lora_alpha)
    schedule = optax.cosine_decay_schedule(args.lr, max(args.steps, 1))
    optimizer = optax.adamw(schedule, weight_decay=0.01)

    if args.full_finetune:
        trainable = params
        step_fn = make_train_step(cfg.model, optimizer)
    else:
        trainable = L.init_lora(
            jax.random.PRNGKey(args.seed + 1), cfg.model, params,
            r=args.lora_r, alpha=args.lora_alpha,
        )
        step_fn = make_train_step(
            cfg.model, optimizer, base_params=params, lora_scale=scale
        )
    state = init_train_state(trainable, optimizer)
    jitted = jax.jit(step_fn)

    os.makedirs(args.out_dir, exist_ok=True)
    mgr = CheckpointManager(os.path.join(args.out_dir, "ckpts"),
                            max_to_keep=2)
    losses = []
    t0 = time.time()
    step = 0
    while step < args.steps:
        for tokens, lens in D.batches(
            tokenizer, records, args.batch_size, args.max_len,
            shuffle_rng=rng,
        ):
            state, loss = jitted(state, tokens, lens)
            step += 1
            losses.append(float(loss))
            if step % args.log_every == 0 or step == args.steps:
                print(f"step {step}/{args.steps} loss {float(loss):.4f} "
                      f"({(time.time() - t0):.1f}s)", flush=True)
            if args.save_every and step % args.save_every == 0:
                mgr.save(step, state.params)
            if args.sample_every and step % args.sample_every == 0:
                _sample(cfg, params, state.params, tokenizer, args, scale)
            if step >= args.steps:
                break
    mgr.save(step, state.params)
    mgr.close()
    save_params(
        os.path.join(args.out_dir, "adapter"), state.params,
        metadata={
            "kind": "full" if args.full_finetune else "lora",
            "lora_r": args.lora_r, "lora_alpha": args.lora_alpha,
            "steps": step, "final_loss": losses[-1] if losses else None,
            "vocab_size": cfg.model.vocab_size,
        },
    )
    print(json.dumps({"steps": step, "first_loss": losses[0],
                      "final_loss": losses[-1]}))
    return 0


def _sample(cfg, base_params, trainable, tokenizer, args, scale) -> None:
    """Periodic greedy sample (the reference's SamplingCallback)."""
    from tts_inference_tpu.config import SamplingConfig
    from tts_inference_tpu.engine.engine import GenerationEngine
    from tts_inference_tpu.training import lora as L

    params = (trainable if args.full_finetune
              else L.merge_params(base_params, trainable, scale))
    eng = GenerationEngine(params, cfg.model, cfg.engine)
    prompt = tokenizer.encode("tara: sample check")
    from tts_inference_tpu import protocol as P

    res = eng.generate(
        P.format_prompt_ids(prompt),
        SamplingConfig(greedy=True, max_tokens=24, repetition_penalty=1.0),
    )
    print(f"  sample tokens: {res.token_ids[:12]}…", flush=True)


def cmd_merge(args) -> int:
    """Adapter + base → merged serving checkpoint (modal_merge_base.py)."""
    from tts_inference_tpu.training import lora as L
    from tts_inference_tpu.training.checkpoint import restore_params, save_params

    cfg, params, _ = _model_setup(args)
    adapter, meta = restore_params(os.path.join(args.adapter_dir, "adapter"))
    if meta.get("kind") == "full":
        merged = adapter
    else:
        scale = L.lora_scale(meta.get("lora_r", args.lora_r),
                             meta.get("lora_alpha", args.lora_alpha))
        if meta.get("vocab_size") and meta["vocab_size"] != cfg.model.vocab_size:
            from tts_inference_tpu.training.data import extend_vocab

            params = extend_vocab(
                params, meta["vocab_size"] - cfg.model.vocab_size,
                seed=args.seed,
            )
        merged = L.merge_params(params, adapter, scale)
    save_params(args.out_dir, merged, metadata={
        "kind": "merged", "source_adapter": args.adapter_dir, **meta,
    })
    print(json.dumps({"out_dir": args.out_dir, "kind": "merged"}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="finetune")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--tiny", action="store_true")
        p.add_argument("--cpu", action="store_true")
        p.add_argument("--model-path")
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--lora-r", type=int, default=16)
        p.add_argument("--lora-alpha", type=float, default=32.0)

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--dataset", help="JSONL with text/voice/codes records, "
                                     "or an HF-datasets on-disk dir "
                                     "(arrow/parquet)")
    t.add_argument("--synthetic-records", type=int, default=32)
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=2)
    t.add_argument("--max-len", type=int, default=128)
    t.add_argument("--lr", type=float, default=2e-4)
    t.add_argument("--log-every", type=int, default=5)
    t.add_argument("--save-every", type=int, default=50)
    t.add_argument("--sample-every", type=int, default=0,
                   help="greedy sample every N steps (0 = off)")
    t.add_argument("--extend-vocab", action="store_true")
    t.add_argument("--full-finetune", action="store_true")
    t.add_argument("--out-dir", required=True)
    t.set_defaults(fn=cmd_train)

    m = sub.add_parser("merge")
    common(m)
    m.add_argument("--adapter-dir", required=True)
    m.add_argument("--out-dir", required=True)
    m.set_defaults(fn=cmd_merge)

    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
