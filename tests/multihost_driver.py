"""Subprocess driver for tests/test_multihost.py.

Each child process joins a jax.distributed cluster (gloo TCP collectives
over localhost — the CI stand-in for DCN between TPU hosts), builds the
global (dp over DCN) x (tp over "ICI" = local devices) mesh, and runs the
shared computation below. The parent test runs the SAME computation on a
single-process 8-device mesh and compares results: multi-host execution
must be a pure performance transform.

Reference analog: none — the reference's only multi-machine pattern is
Modal container fan-out (`modal_benchmark.py:140-142`); SURVEY §5.8 calls
for first-party DCN support, exercised here.
"""

from __future__ import annotations

import sys


def compute(mesh):
    """Sharded train step + prefill digest over `mesh`; returns scalars.

    jax is imported lazily so the multi-process children can initialize
    jax.distributed before any backend is touched.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tts_inference_tpu.config import ModelConfig
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.parallel import mesh as M
    from tts_inference_tpu.training import lora as lora_lib
    from tts_inference_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    dp, tp = mesh.devices.shape
    model_cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=max(4, tp), head_dim=16,
        rope_scaling_factor=None, max_position_embeddings=256,
        dtype="float32",
    )
    M.validate_tp(model_cfg, tp)
    params = llama.init_llama_params(jax.random.PRNGKey(0), model_cfg)
    sparams = M.shard_tree(params, M.llama_param_pspecs(model_cfg), mesh)

    rng = np.random.default_rng(0)
    batch, seq = 2 * dp, 32
    tokens_h = rng.integers(0, 512, size=(batch, seq)).astype(np.int32)
    lens_h = np.full((batch,), seq, np.int32)
    tokens = jax.device_put(tokens_h, NamedSharding(mesh, P("dp", None)))
    lens = jax.device_put(lens_h, NamedSharding(mesh, P("dp")))

    # (a) the full LoRA train step: grads reduce over dp (DCN), TP psums
    # stay within each host's tp row
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), model_cfg, sparams, r=4)
    lora = M.shard_tree(lora, lora_lib.lora_pspecs(model_cfg, lora), mesh)
    optimizer = optax.adamw(1e-4)
    state = init_train_state(lora, optimizer)
    train_step = make_train_step(model_cfg, optimizer, base_params=sparams)
    with mesh:
        state, loss = jax.jit(train_step)(state, tokens, lens)
        loss = float(jax.device_get(loss))

    # (b) inference prefill digest: dp-sharded batch through the serving
    # forward; the scalar reduction is replicated, so every process can
    # fetch it locally
    cache = llama.init_kv_cache(model_cfg, batch, 64)
    cache = M.shard_tree(cache, M.kv_cache_pspecs(model_cfg), mesh)

    def digest_fn(p, t, ln, c):
        logits, _ = llama.prefill(p, model_cfg, t, ln, c)
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    with mesh:
        digest = jax.jit(digest_fn)(sparams, tokens, lens, cache)
        digest = float(jax.device_get(digest))
    return loss, digest


def serve_tick(mesh=None, replicate=False):
    """A lockstep serving tick: tiny EngineCore prefill + decode.

    With a multi-process mesh and replicate=True every process fetches the
    full (replicated) token outputs and would take identical scheduling
    decisions — the SPMD serving contract. Returns the token matrix.
    """
    import numpy as np

    from tts_inference_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig,
    )
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.ops import sampling as S

    dp = mesh.devices.shape[0] if mesh is not None else 1
    tp = mesh.devices.shape[1] if mesh is not None else 1
    model_cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=max(4, tp), head_dim=16,
        rope_scaling_factor=None, max_position_embeddings=256,
        dtype="float32",
    )
    ecfg = EngineConfig(
        max_batch_size=2 * dp, max_input_len=32, max_output_len=96,
        prefill_buckets=(16, 32), kv_buckets=(32, 64),
        decode_steps_per_call=4,
    )
    import jax

    params = llama.init_llama_params(jax.random.PRNGKey(0), model_cfg)
    core = EngineCore(params, model_cfg, ecfg, eos_id=5, mesh=mesh,
                      replicate_token_outs=replicate)
    sp = S.SamplingParams.from_config(
        SamplingConfig(greedy=True), ecfg.max_batch_size
    )
    core.seed_slots([0, 1], [1, 2])
    toks0, tok, act = core.prefill_decode_launch(
        [[7, 8, 9, 10], [11, 12, 13]], [0, 1], sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool), n=3,
    )
    toks1, _, _ = core.decode_steps(sp, tok, act)
    return np.concatenate(
        [np.asarray(toks0)[:2], np.asarray(toks1)[:2]], axis=1
    )


def main() -> None:
    pid, nproc, port, tp = (int(a) for a in sys.argv[1:5])
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    from tts_inference_tpu.parallel.multihost import (
        init_multihost, make_global_mesh,
    )

    init_multihost(
        f"127.0.0.1:{port}", nproc, pid, platform="cpu",
        local_cpu_devices=4,
    )
    import jax

    mesh = make_global_mesh(tp=tp)
    if mode == "serve":
        toks = serve_tick(mesh, replicate=True)
        flat = ",".join(str(int(t)) for t in toks.ravel())
        print(
            f"MHSERVE pid={pid} nproc={jax.process_count()} "
            f"ndev={jax.device_count()} toks=[{flat}]",
            flush=True,
        )
        return
    loss, digest = compute(mesh)
    print(
        f"MHOK pid={pid} nproc={jax.process_count()} "
        f"ndev={jax.device_count()} local={len(jax.local_devices())} "
        f"loss={loss:.6f} digest={digest:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
