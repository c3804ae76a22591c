"""Runtime assembly: config + checkpoints → ready TTSPipeline.

The warm-container load path (reference: `@modal.enter` load_models,
`tensorrt_tts/inference.py:128-168` — tokenizer + engine + SNAC + warmup)
as an explicit factory. Without checkpoint paths it builds random-weight
models (bench/tests run with zero downloadable assets).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax

from tts_inference_tpu import protocol
from tts_inference_tpu.config import Config, tiny_config
from tts_inference_tpu.engine.engine import GenerationEngine
from tts_inference_tpu.models import llama, snac
from tts_inference_tpu.streaming.pipeline import TTSPipeline
from tts_inference_tpu.utils.tokenizer import ByteTokenizer, load_tokenizer


DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/tts_inference_tpu/xla")


def enable_compilation_cache(cache_dir: Optional[str]) -> None:
    """Persistent XLA compilation cache — the analog of the reference's saved
    TRT engine dir (`build_engine.py:149-150`): pay compile once, reload in
    seconds on warm start. Always on (the 3B graphs take minutes to compile
    through the remote-compile tunnel); pass a dir to relocate it."""
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@dataclasses.dataclass
class Runtime:
    config: Config
    pipeline: TTSPipeline
    engine: GenerationEngine
    vocoder: snac.SnacDecoder
    tokenizer: object
    load_timings: dict
    mesh: object = None   # jax.sharding.Mesh when config.mesh asks for >1 dev

    @classmethod
    def create(
        cls,
        config: Optional[Config] = None,
        *,
        model_path: Optional[str] = None,
        snac_path: Optional[str] = None,
        lora_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        seed: int = 0,
        warmup: bool = False,
        quantize: bool = False,
        weight_bits: int = 8,
        mesh=None,
    ) -> "Runtime":
        config = config or Config()
        enable_compilation_cache(config.engine.compilation_cache_dir)
        timings = {}

        t0 = time.perf_counter()
        if model_path and os.path.exists(
            os.path.join(model_path, "params")
        ):
            # framework-native orbax checkpoint (training/finetune.py merge
            # output): finetune → merge → serve without HF round trips
            from tts_inference_tpu.training.checkpoint import restore_params

            params, meta = restore_params(model_path)
            if meta.get("model_config"):
                # checkpoint carries its own dims (`cli quantize` output);
                # only performance knobs carry over from the passed config
                from tts_inference_tpu.config import ModelConfig

                mc = ModelConfig(**{
                    k: v for k, v in meta["model_config"].items()
                    if k in ModelConfig.__dataclass_fields__
                })
                mc = dataclasses.replace(
                    mc,
                    use_pallas_attention=config.model.use_pallas_attention,
                )
                config = dataclasses.replace(config, model=mc)
            elif meta.get("vocab_size"):
                config = dataclasses.replace(
                    config, model=dataclasses.replace(
                        config.model, vocab_size=int(meta["vocab_size"])
                    )
                )
            if meta.get("quantized"):
                # pre-quantized checkpoint (`cli quantize` output): rebuild
                # the Quant* leaves and skip the boot-time re-quantization
                from tts_inference_tpu.models.quant import from_plain

                params = from_plain(params)
                quantize = False
        elif model_path:
            from tts_inference_tpu.models.loader import load_llama_checkpoint

            # the checkpoint's own config.json wins over the default
            # ModelConfig (HF convention; a non-Orpheus-sized checkpoint must
            # not be loaded through Orpheus dims) — only performance knobs
            # carry over from the passed config
            has_hf_cfg = os.path.exists(
                os.path.join(model_path, "config.json")
            )
            params, model_cfg = load_llama_checkpoint(
                model_path, None if has_hf_cfg else config.model,
                lora_path=lora_path,
                # checkpoint config decides its own dtype; loader derives it
                dtype=None if has_hf_cfg
                else llama.param_dtype(config.model),
            )
            if has_hf_cfg:
                model_cfg = dataclasses.replace(
                    model_cfg,
                    use_pallas_attention=config.model.use_pallas_attention,
                )
            config = dataclasses.replace(config, model=model_cfg)
        else:
            # one jit around the whole init: eager per-tensor jax.random
            # calls each compile a micro-graph over the remote tunnel
            # (PERF.md round-4 boot anatomy — same fix as the vocoder's)
            params = jax.jit(
                llama.init_llama_params, static_argnums=(1,)
            )(jax.random.PRNGKey(seed), config.model)
        if quantize:
            from tts_inference_tpu.models.quant import quantize_llama_params

            # weight_bits=4: per-group int4 linears via the Pallas matvec
            # kernel (embed/head stay int8) — the decode weight-read floor
            # halves again; quality-gate with tools/audio_fidelity.py before
            # making it a product default.
            params = quantize_llama_params(params, bits=weight_bits)
        timings["load_model_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if snac_path:
            from tts_inference_tpu.models.loader import load_snac_checkpoint

            # as with the LM: the checkpoint's own config.json wins
            snac_has_cfg = os.path.exists(
                os.path.join(snac_path, "config.json")
            )
            vparams, snac_cfg = load_snac_checkpoint(
                snac_path, None if snac_has_cfg else config.snac
            )
            config = dataclasses.replace(config, snac=snac_cfg)
        else:
            vparams = snac.init_snac_params_fast(
                jax.random.PRNGKey(seed + 1), config.snac
            )
        vocoder = snac.SnacDecoder(vparams, config.snac)
        timings["load_snac_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        tok_dir = tokenizer_path
        if tok_dir is None and model_path and any(
            os.path.exists(os.path.join(model_path, f))
            for f in ("tokenizer.json", "tokenizer_config.json")
        ):
            tok_dir = model_path
        tokenizer = load_tokenizer(tok_dir) if tok_dir else ByteTokenizer()
        timings["load_tokenizer_s"] = time.perf_counter() - t0

        # sharded serving: build the device mesh once; the single-stream
        # engine and the continuous-batching scheduler both run their jitted
        # graphs over it (TP over ICI + DP over slots, SURVEY.md §5.8)
        if mesh is None and config.mesh.num_devices > 1:
            from tts_inference_tpu.parallel import mesh as M

            mesh = M.make_mesh(config.mesh)

        # first-dispatch burst sizes for the TTFA fast path: tokens needed
        # for the first stable chunk under the configured stream defaults
        # (each is a fused graph shape compiled at warmup)
        s = config.stream
        bursts = {(s.first_chunk_frames + s.lookahead_frames)
                  * protocol.FRAME_SIZE}
        if s.first_chunk_lookahead is not None:
            bursts.add((s.first_chunk_frames + s.first_chunk_lookahead)
                       * protocol.FRAME_SIZE)
        engine = GenerationEngine(
            params, config.model, config.engine,
            eos_id=protocol.TOKEN_EOS, seed=seed, mesh=mesh,
            first_bursts=sorted(bursts),
        )
        pipeline = TTSPipeline(engine, vocoder, tokenizer, config)

        if warmup:
            t0 = time.perf_counter()
            info = engine.warmup()
            # warm the vocoder buckets too (reference warms SNAC with a dummy
            # decode, modal_audio_stream.py:120-127)
            import numpy as np

            for b in vocoder.frame_buckets[:2]:
                vocoder.decode_frames(
                    np.zeros(b, np.int32), np.zeros(2 * b, np.int32),
                    np.zeros(4 * b, np.int32),
                )
            timings["warmup_s"] = time.perf_counter() - t0
            timings.update({
                k: (v / 1000.0
                    if isinstance(v, (int, float)) and k != "graphs_compiled"
                    else v)
                for k, v in info.items()
            })

        return cls(config, pipeline, engine, vocoder, tokenizer, timings,
                   mesh=mesh)

    def write_build_info(self, path: str) -> None:
        """build_info.json analog (`build_engine.py:162-175`)."""
        info = {
            "framework": "tts_inference_tpu",
            "backend": jax.devices()[0].platform,
            "model": dataclasses.asdict(self.config.model),
            "engine": dataclasses.asdict(self.config.engine),
            "snac": dataclasses.asdict(self.config.snac),
            "load_timings": self.load_timings,
        }
        with open(path, "w") as f:
            json.dump(info, f, indent=2, default=str)


def create_tiny_runtime(seed: int = 0, warmup: bool = False) -> Runtime:
    """Tiny random-weight runtime (tests, smoke benches, CLI --tiny)."""
    return Runtime.create(tiny_config(), seed=seed, warmup=warmup)
