"""Mesh sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.7:
the reference has no distributed test story; this is ours).

Key property: TP/DP sharding must be a pure performance transform — sharded
forward/decode results equal the unsharded ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tts_inference_tpu.config import MeshConfig, ModelConfig
from tts_inference_tpu.models import llama
from tts_inference_tpu.parallel import mesh as M

CFG = ModelConfig(
    vocab_size=512, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=16, rope_scaling_factor=None, max_position_embeddings=128,
    dtype="float32",
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return M.make_mesh(MeshConfig(dp=2, tp=4))


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def test_validate_tp():
    M.validate_tp(CFG, 4)
    with pytest.raises(ValueError):
        M.validate_tp(CFG, 8)  # kv heads 4 % 8 != 0


def test_sharded_forward_matches_unsharded(mesh, params):
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 512, size=(4, 24)).astype(np.int32)
    lens = np.full((4,), 24, np.int32)

    cache = llama.init_kv_cache(CFG, 4, 32)
    hidden, _ = llama.forward(
        params, CFG, jnp.asarray(tokens), cache,
        jnp.zeros(4, jnp.int32), jnp.asarray(lens),
    )
    want = np.asarray(llama.compute_logits(params, CFG, hidden))

    sp = M.shard_tree(params, M.llama_param_pspecs(CFG), mesh)
    scache = M.shard_tree(
        llama.init_kv_cache(CFG, 4, 32), M.kv_cache_pspecs(CFG), mesh
    )
    stoks = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    slens = jax.device_put(lens, NamedSharding(mesh, P("dp")))

    with mesh:
        fwd = jax.jit(
            lambda p, t, c, l: llama.compute_logits(
                p, CFG, llama.forward(p, CFG, t, c, jnp.zeros(4, jnp.int32), l)[0]
            )
        )
        got = np.asarray(fwd(sp, stoks, scache, slens))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_decode_step_matches(mesh, params):
    """The serving hot loop under TP×DP: prefill + 3 decode steps."""
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 512, size=(2, 8)).astype(np.int32)
    lens = np.full((2,), 8, np.int32)

    def run(params, cache, device_put=lambda x, s=None: x, mesh_ctx=None):
        logits, cache = llama.prefill(
            params, CFG, jnp.asarray(tokens), jnp.asarray(lens), cache
        )
        toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
        for _ in range(3):
            logits, cache = llama.decode_one(params, CFG, toks[-1], cache)
            toks.append(jnp.argmax(logits, -1).astype(jnp.int32))
        return np.stack([np.asarray(t) for t in toks])

    want = run(params, llama.init_kv_cache(CFG, 2, 32))

    sp = M.shard_tree(params, M.llama_param_pspecs(CFG), mesh)
    # dp=2 over batch 2; kv heads over tp
    scache = M.shard_tree(
        llama.init_kv_cache(CFG, 2, 32), M.kv_cache_pspecs(CFG), mesh
    )
    with mesh:
        got = run(sp, scache)
    np.testing.assert_array_equal(got, want)


def test_lora_training_step_decreases_loss(mesh, params):
    import optax

    from tts_inference_tpu.training import lora as lora_lib
    from tts_inference_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    sp = M.shard_tree(params, M.llama_param_pspecs(CFG), mesh)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), CFG, sp, r=4)
    lora = M.shard_tree(lora, lora_lib.lora_pspecs(CFG, lora), mesh)

    opt = optax.adam(1e-2)
    state = init_train_state(lora, opt)
    step = make_train_step(CFG, opt, base_params=sp, lora_scale=2.0)

    rng = np.random.default_rng(2)
    tokens = jax.device_put(
        rng.integers(0, 512, size=(4, 16)).astype(np.int32),
        NamedSharding(mesh, P("dp", None)),
    )
    lens = jax.device_put(
        np.full((4,), 16, np.int32), NamedSharding(mesh, P("dp"))
    )
    with mesh:
        jitted = jax.jit(step)
        losses = []
        for _ in range(8):
            state, loss = jitted(state, tokens, lens)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_full_finetune_step_runs(mesh, params):
    import optax

    from tts_inference_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    sp = M.shard_tree(params, M.llama_param_pspecs(CFG), mesh)
    opt = optax.adamw(1e-4)
    state = init_train_state(sp, opt)
    step = make_train_step(CFG, opt)
    rng = np.random.default_rng(3)
    tokens = jax.device_put(
        rng.integers(0, 512, size=(2, 12)).astype(np.int32),
        NamedSharding(mesh, P("dp", None)),
    )
    lens = jax.device_put(np.full((2,), 12, np.int32),
                          NamedSharding(mesh, P("dp")))
    with mesh:
        state, loss = jax.jit(step)(state, tokens, lens)
    assert np.isfinite(float(loss))


def test_lora_merge_matches_functional(params):
    """merged weights == base + scale·A@B applied at the weight level —
    and zero-B adapters are a no-op (fresh init must not change the model)."""
    from tts_inference_tpu.training import lora as lora_lib

    lora = lora_lib.init_lora(jax.random.PRNGKey(5), CFG, params, r=4)
    merged = lora_lib.merge_params(params, lora, scale=2.0)
    # B is zero at init → merge is identity
    np.testing.assert_allclose(
        np.asarray(merged["layers"][0]["wq"]),
        np.asarray(params["layers"][0]["wq"]),
    )
    # nonzero B changes weights by exactly scale*A@B
    lora["layers"][0]["wq"]["B"] = jnp.ones_like(lora["layers"][0]["wq"]["B"])
    merged = lora_lib.merge_params(params, lora, scale=0.5)
    delta = np.asarray(merged["layers"][0]["wq"]) - np.asarray(
        params["layers"][0]["wq"]
    )
    want = 0.5 * np.asarray(lora["layers"][0]["wq"]["A"]) @ np.ones(
        (4, CFG.num_attention_heads * CFG.head_dim), np.float32
    )
    np.testing.assert_allclose(delta, want, atol=1e-5)
