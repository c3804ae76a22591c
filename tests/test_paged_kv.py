"""Paged/blocked KV cache tests (reference analog: TRT-LLM paged KV,
32 tok/block, `tensorrt_tts/PIPELINE_REPORT.md:58-64`).

Correctness bar: paged is a memory-layout transform — greedy outputs must
equal the dense cache bit-for-bit, under int8 KV and TP/DP sharding too.
Capacity behavior: admission is gated on pool blocks (TRT in-flight
batching semantics); deferred requests complete once blocks free up.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_inference_tpu.config import (
    EngineConfig, ModelConfig, SamplingConfig,
)
from tts_inference_tpu.engine.engine import EngineCore
from tts_inference_tpu.models import llama
from tts_inference_tpu.ops import sampling as S

CFG = ModelConfig.tiny(vocab_size=512)
DENSE = EngineConfig(
    max_batch_size=4, max_input_len=32, max_output_len=96,
    prefill_buckets=(8, 16, 32), kv_buckets=(32, 64),
    decode_steps_per_call=4,
)
PAGED = dataclasses.replace(DENSE, paged_kv=True, kv_block_size=16)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def test_model_level_dense_vs_paged(params):
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 512, size=(2, 8)).astype(np.int32)
    lens = np.full((2,), 8, np.int32)

    def run(cache):
        logits, cache = llama.prefill(
            params, CFG, jnp.asarray(tokens), jnp.asarray(lens), cache
        )
        toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
        for _ in range(5):
            logits, cache = llama.decode_one(
                params, CFG, toks[-1], cache, kv_window=32
            )
            toks.append(jnp.argmax(logits, -1).astype(jnp.int32))
        return np.stack([np.asarray(t) for t in toks])

    for int8 in (False, True):
        dense = run(llama.init_kv_cache(CFG, 2, 64, int8=int8))
        pc = llama.init_paged_kv_cache(
            CFG, 2, 64, num_blocks=12, block_size=16, int8=int8
        )
        table = np.zeros((2, 4), np.int32)
        table[0] = [1, 2, 3, 4]
        table[1] = [5, 6, 7, 8]
        paged = run(pc._replace(block_table=jnp.asarray(table)))
        np.testing.assert_array_equal(dense, paged, err_msg=f"int8={int8}")


def engine_tokens(core, prompts, slots, reserve):
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), core.batch)
    core.seed_slots(slots, [7] * len(slots))
    t0, tok, act = core.prefill_decode_launch(
        prompts, slots, sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool),
        n=3, reserve_extra=reserve,
    )
    t1, tok, act = core.decode_steps_launch(sp, tok, act)
    t2, _, _ = core.decode_steps_launch(sp, tok, act)
    return np.concatenate(
        [np.asarray(t0), np.asarray(t1), np.asarray(t2)], axis=1
    )


def test_engine_paged_matches_dense(params):
    prompts = [[7, 8, 9, 10, 11], [13, 14, 15]]
    a = engine_tokens(
        EngineCore(params, CFG, PAGED, eos_id=5), prompts, [0, 1], [24, 24]
    )
    b = engine_tokens(
        EngineCore(params, CFG, DENSE, eos_id=5), prompts, [0, 1], None
    )
    np.testing.assert_array_equal(a[:2], b[:2])


def test_engine_paged_int8_matches_dense_int8(params):
    d8 = dataclasses.replace(DENSE, kv_cache_int8=True)
    p8 = dataclasses.replace(PAGED, kv_cache_int8=True)
    prompts = [[7, 8, 9, 10, 11]]
    a = engine_tokens(EngineCore(params, CFG, p8, eos_id=5), prompts, [0],
                      [24])
    b = engine_tokens(EngineCore(params, CFG, d8, eos_id=5), prompts, [0],
                      None)
    np.testing.assert_array_equal(a[:1], b[:1])


def test_allocator_reserve_free_cycle(params):
    core = EngineCore(params, CFG, PAGED, eos_id=5)
    total = core.free_tokens()
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)
    core.prefill_slots([[7, 8, 9]], [0], sp, reserve_extra=[20])
    # bucket 8 + 20 + slack 5 = 33 → 3 blocks of 16 = 48 tokens
    assert core.free_tokens() == total - 48
    core.reset_slots([0])
    assert core.free_tokens() == total
    # demand estimate matches what reservation actually takes
    assert core.kv_demand(3, 20) == 48


def test_pool_exhaustion_raises(params):
    small = dataclasses.replace(PAGED, kv_pool_tokens=64)   # 4 blocks + trash
    core = EngineCore(params, CFG, small, eos_id=5)
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), 4)
    core.prefill_slots([[7, 8, 9]], [0], sp, reserve_extra=[40])  # 64 tokens
    with pytest.raises(RuntimeError, match="KV pool exhausted"):
        core.prefill_slots([[7, 8, 9]], [1], sp, reserve_extra=[40])


def test_max_seq_property_and_freeze(params):
    """Device-side freeze bound uses the paged per-slot capacity."""
    core = EngineCore(params, CFG, PAGED, eos_id=5)
    assert core.cache.max_seq == PAGED.max_seq_len


def test_scheduler_capacity_gating_completes_all():
    """A pool too small for all requests at once: extras are HELD, admitted
    as blocks free, and every stream still completes with correct output."""
    import tests.test_scheduler as TS
    from tts_inference_tpu.config import tiny_config
    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import Runtime

    def run(paged_pool):
        cfg = tiny_config()
        if paged_pool:
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, paged_kv=True, kv_block_size=16,
                kv_pool_tokens=paged_pool,
            ))
        rt = Runtime.create(cfg, seed=0)
        s = Scheduler(rt.engine.core.params, rt.config, rt.vocoder,
                      rt.tokenizer)
        reqs = [TS.mk_req(f"text {i}", seed=70 + i) for i in range(4)]
        for r in reqs:
            s.submit(r)
        TS.run_until_idle(s, max_iters=4000)
        s.drain_vocoder()
        out = [TS.drain(r) for r in reqs]
        s.stop()
        return out

    # tiny cfg: bucket 16 + max_tokens 35 + slack 8 = 59 → 4 blocks = 64
    # tokens per request; pool of 140 tokens (8 blocks) fits TWO at a time
    gated = run(140)
    dense = run(None)
    for (pcm_a, m_a), (pcm_b, m_b) in zip(gated, dense):
        assert m_a.tokens == m_b.tokens
        assert pcm_a == pcm_b


def test_sharded_paged_matches(params):
    from tts_inference_tpu.config import MeshConfig
    from tts_inference_tpu.parallel import mesh as M

    assert jax.device_count() >= 8
    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, rope_scaling_factor=None, max_position_embeddings=256,
        dtype="float32",
    )
    p = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    mesh = M.make_mesh(MeshConfig(dp=2, tp=4))
    prompts = [[7, 8, 9, 10], [13, 14]]
    a = engine_tokens(
        EngineCore(p, cfg, PAGED, eos_id=5, mesh=mesh), prompts, [0, 1],
        [24, 24],
    )
    b = engine_tokens(
        EngineCore(p, cfg, PAGED, eos_id=5), prompts, [0, 1], [24, 24]
    )
    np.testing.assert_array_equal(a[:2], b[:2])


@pytest.mark.slow
def test_warmup_with_paged(params):
    core = EngineCore(params, CFG, PAGED, eos_id=5)
    info = core.warmup_graphs()
    assert info["warmed_buckets"] == list(PAGED.prefill_buckets)
    # warmup must leave the pool fully free
    assert core.free_tokens() == (core.cache.num_blocks - 1) * 16


# ---- paged + int8 + prefix composability (VERDICT r2 Missing #4) -----------


VOICE_HEADER = [101, 102, 103, 104, 105, 106]  # shared "{voice}: " tokens


@pytest.mark.parametrize("int8", [False, True])
def test_paged_prefix_matches_dense(params, int8):
    """The three capacity features enabled TOGETHER (paged + int8 KV +
    prefix cache) must produce greedy outputs bit-equal to the plain dense
    engine with the same KV precision — prefix injection targets pool
    blocks, int8 pools dequant identically."""
    full = dataclasses.replace(
        PAGED, prefix_cache=True, kv_cache_int8=int8, prefix_len=8,
    )
    dense = dataclasses.replace(DENSE, kv_cache_int8=int8)
    prompts = [VOICE_HEADER + [7, 8, 9, 10, 11],
               VOICE_HEADER + [13, 14, 15]]
    a = engine_tokens(EngineCore(params, CFG, full, eos_id=5),
                      prompts, [0, 1], [24, 24])
    b = engine_tokens(EngineCore(params, CFG, dense, eos_id=5),
                      prompts, [0, 1], [24, 24])
    np.testing.assert_array_equal(a[:2], b[:2], err_msg=f"int8={int8}")


def test_paged_prefix_hit_matches_and_frees_blocks(params):
    """Second same-prefix request on the paged engine: prefix HIT, identical
    tokens, and the block pool returns to fully free after release."""
    full = dataclasses.replace(PAGED, prefix_cache=True, prefix_len=8)
    core = EngineCore(params, CFG, full, eos_id=5)
    free0 = core.free_tokens()
    prompt = [VOICE_HEADER + [7, 8, 9, 10, 11, 12]]
    first = engine_tokens(core, prompt, [0], [24])
    assert core.prefix_misses == 1 and core.prefix_hits == 0
    core.reset_slots([0])
    assert core.free_tokens() == free0
    second = engine_tokens(core, prompt, [0], [24])
    assert core.prefix_hits == 1
    np.testing.assert_array_equal(first[0], second[0])
    core.reset_slots([0])
    assert core.free_tokens() == free0


def test_paged_prefix_reservation_covers_prefix(params):
    """Reservation must count the injected prefix positions: a slot whose
    prefix + suffix + budget spans multiple blocks reserves them all (no
    trash-block writes for real positions)."""
    full = dataclasses.replace(PAGED, prefix_cache=True, prefix_len=8)
    core = EngineCore(params, CFG, full, eos_id=5)
    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True), core.batch)
    prompt = VOICE_HEADER + [7, 8]          # cut=8 prefix, 0-len... suffix
    core.prefill_decode_launch(
        [prompt], [0], sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool),
        n=3, reserve_extra=[40],
    )
    # prefix 8 + suffix bucket 8 (>=1 tok) + 40 + slack 5 = 61 → 4 blocks
    assert len(core._slot_blocks[0]) == 4


def test_engine_paged_int4_weights_matches_dense(params):
    """int4 weights (the third capacity feature) compose with paged + int8
    KV: greedy tokens equal the dense-KV engine's with the SAME int4
    params — weight quantization is orthogonal to the KV layout."""
    from tts_inference_tpu.models.quant import quantize_llama_params

    q4 = quantize_llama_params(params, bits=4)
    d = dataclasses.replace(DENSE, kv_cache_int8=True)
    p = dataclasses.replace(PAGED, kv_cache_int8=True)
    prompts = [[7, 8, 9, 10, 11]]
    a = engine_tokens(EngineCore(q4, CFG, p, eos_id=5), prompts, [0], [24])
    b = engine_tokens(EngineCore(q4, CFG, d, eos_id=5), prompts, [0], None)
    np.testing.assert_array_equal(a[:1], b[:1])
