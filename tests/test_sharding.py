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


@pytest.mark.slow
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


def test_sharded_engine_core_matches_unsharded(mesh, params):
    """The SERVING graphs (EngineCore: fused prefill+decode, windowed decode,
    donation, on-device sampling) under TP×DP equal the unsharded core —
    sharding the engine is a pure performance transform."""
    from tts_inference_tpu.config import EngineConfig, SamplingConfig
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.ops import sampling as S

    ecfg = EngineConfig(
        max_batch_size=4, max_input_len=32, max_output_len=96,
        prefill_buckets=(16, 32), kv_buckets=(32, 64),
        decode_steps_per_call=4,
    )
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)
    prompts = [[7, 8, 9, 10], [11, 12, 13]]

    def run(m):
        core = EngineCore(params, CFG, ecfg, eos_id=5, mesh=m)
        core.seed_slots([0, 1], [1, 2])
        toks0, tok, act = core.prefill_decode_launch(
            prompts, [0, 1], sp,
            np.zeros(4, np.int32), np.zeros(4, bool), n=3,
        )
        toks1, _, _ = core.decode_steps(sp, tok, act)
        return np.concatenate([np.asarray(toks0), toks1], axis=1)

    np.testing.assert_array_equal(run(mesh), run(None))


def test_sharded_quantized_engine_matches(mesh, params):
    """int8 weight-only quantization composes with TP/DP sharding
    (adapt_pspecs expands the dense specs over QuantLinear/QuantEmbed)."""
    from tts_inference_tpu.config import EngineConfig, SamplingConfig
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models.quant import quantize_llama_params
    from tts_inference_tpu.ops import sampling as S

    qparams = quantize_llama_params(params)
    ecfg = EngineConfig(
        max_batch_size=4, max_input_len=16, max_output_len=48,
        prefill_buckets=(16,), kv_buckets=(32,), decode_steps_per_call=3,
    )
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)

    def run(m):
        core = EngineCore(qparams, CFG, ecfg, eos_id=5, mesh=m)
        first = core.prefill_slots([[7, 8, 9]], [0], sp)
        toks, _, _ = core.decode_steps(
            sp, first, np.array([True, False, False, False])
        )
        return np.concatenate([first[:1, None], toks[:1]], axis=1)

    np.testing.assert_array_equal(run(mesh), run(None))


def test_sharded_prefix_cache_matches(mesh, params):
    """Prefix caching composes with TP/DP sharding (pool rows gathered
    inside the sharded prefill graph), still bit-exact vs unsharded."""
    import dataclasses

    from tts_inference_tpu.config import EngineConfig, SamplingConfig
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.ops import sampling as S

    ecfg = EngineConfig(
        max_batch_size=4, max_input_len=32, max_output_len=96,
        prefill_buckets=(8, 16, 32), kv_buckets=(32, 64),
        decode_steps_per_call=4, prefix_cache=True,
    )
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)
    prompts = [[9] * 6 + [7, 8, 9, 10], [9] * 6 + [13, 14]]

    def run(m):
        core = EngineCore(params, CFG, ecfg, eos_id=5, mesh=m)
        core.seed_slots([0, 1], [1, 2])
        t0, tok, act = core.prefill_decode_launch(
            prompts, [0, 1], sp, np.zeros(4, np.int32), np.zeros(4, bool),
            n=3,
        )
        t1, _, _ = core.decode_steps(sp, tok, act)
        core.reset_slots([0, 1])
        t2, tok, act = core.prefill_decode_launch(   # prefix HIT path
            prompts, [0, 1], sp, tok, act, n=3
        )
        return (np.concatenate(
            [np.asarray(t0)[:2], t1[:2], np.asarray(t2)[:2]], axis=1
        ), core.prefix_hits)

    a, hits_a = run(mesh)
    b, hits_b = run(None)
    np.testing.assert_array_equal(a, b)
    assert hits_a == hits_b == 2


def test_sharded_scheduler_stream_matches_unsharded(mesh):
    """Continuous-batching Scheduler emits IDENTICAL audio streams with and
    without a mesh (VERDICT r1 item 2: tp>1 serving must be output-invisible)."""
    from tests.test_scheduler import drain, mk_req, run_until_idle
    from tts_inference_tpu.config import MeshConfig
    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import create_tiny_runtime

    rt = create_tiny_runtime(seed=0)

    def run(m):
        s = Scheduler(
            rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer,
            mesh=m,
        )
        reqs = [mk_req(f"stream {i}", seed=100 + i) for i in range(3)]
        for r in reqs:
            s.submit(r)
        run_until_idle(s)
        s.drain_vocoder()
        out = [drain(r) for r in reqs]
        s.stop()
        return out

    # tiny model: 4 heads / 2 kv heads → tp=2; dp=2 over the 4 slots
    tiny_mesh = M.make_mesh(MeshConfig(dp=2, tp=2))
    sharded = run(tiny_mesh)
    unsharded = run(None)
    for (pcm_a, m_a), (pcm_b, m_b) in zip(sharded, unsharded):
        assert m_a.tokens == m_b.tokens
        assert pcm_a == pcm_b


def test_sampling_state_pspecs_match_structure(mesh):
    """The pspec trees place onto the mesh without structure errors (the
    round-1 bug: sampling_state_pspecs didn't match SamplingState fields)."""
    from tts_inference_tpu.config import SamplingConfig
    from tts_inference_tpu.ops import sampling as S

    sstate = S.init_sampling_state(4, 512, seed=0)
    placed = M.shard_tree(sstate, M.sampling_state_pspecs(), mesh)
    assert placed.presence.shape == sstate.presence.shape
    sp = S.SamplingParams.from_config(SamplingConfig(), 4)
    placed_sp = M.shard_tree(sp, M.sampling_params_pspecs(), mesh)
    assert placed_sp.temperature.shape == sp.temperature.shape


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


def test_sharded_fused_admission_vocode_matches(mesh):
    """The fused admission vocode (batched first-chunk PCM chained onto the
    admission dispatch) under a (dp, tp) mesh: identical streams vs the
    unsharded scheduler, allowing the documented ≤1 int16 LSB batched-conv
    variation (tests/test_fused_admission_vocode.py)."""
    import numpy as np

    from tests.test_scheduler import drain, mk_req, run_until_idle
    from tts_inference_tpu.config import MeshConfig
    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import create_tiny_runtime

    rt = create_tiny_runtime(seed=0)

    def run(m):
        s = Scheduler(
            rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer,
            mesh=m,
        )
        s.admission_steps = 28       # burst covers the 28-token first chunk
        reqs = [mk_req(f"fused {i}", seed=50 + i, max_tokens=56)
                for i in range(3)]
        for r in reqs:
            s.submit(r)
        run_until_idle(s)
        s.drain_vocoder()
        out = [drain(r) for r in reqs]
        used_fused = bool(s._pcm_cache)
        s.stop()
        return out, used_fused

    sharded, fused_a = run(M.make_mesh(MeshConfig(dp=2, tp=2)))
    unsharded, fused_b = run(None)
    assert fused_a and fused_b     # the fused graph actually engaged
    for (pcm_a, m_a), (pcm_b, m_b) in zip(sharded, unsharded):
        assert m_a.tokens == m_b.tokens
        a = np.frombuffer(pcm_a, np.int16).astype(np.int32)
        b = np.frombuffer(pcm_b, np.int16).astype(np.int32)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 1


def test_sharded_int4_engine_matches(mesh, params):
    """int4 weight-only quantization composes with TP/DP sharding:
    adapt_pspecs reuses the dense spec for the packed rows and the
    grouped scales (both follow K/out axes). On the CPU mesh the int4
    matmul runs the jnp reference twin — GSPMD partitions it like any
    XLA op; the Pallas path is exercised single-chip on TPU."""
    from tts_inference_tpu.config import EngineConfig, SamplingConfig
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models.quant import (
        QuantLinearI4, quantize_llama_params)
    from tts_inference_tpu.ops import sampling as S

    qparams = quantize_llama_params(params, bits=4)
    assert isinstance(qparams["layers"][0]["wq"], QuantLinearI4)
    ecfg = EngineConfig(
        max_batch_size=4, max_input_len=16, max_output_len=48,
        prefill_buckets=(16,), kv_buckets=(32,), decode_steps_per_call=3,
    )
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)

    def run(m):
        core = EngineCore(qparams, CFG, ecfg, eos_id=5, mesh=m)
        first = core.prefill_slots([[7, 8, 9]], [0], sp)
        toks, _, _ = core.decode_steps(
            sp, first, np.array([True, False, False, False])
        )
        return np.concatenate([first[:1, None], toks[:1]], axis=1)

    np.testing.assert_array_equal(run(mesh), run(None))
