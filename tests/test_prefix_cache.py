"""Prefix-cache tests (reference analog: vLLM enable_prefix_caching=True,
`modal_audio_stream.py:232`).

Correctness bar: prefix caching must be output-invisible — causal attention
means a prefix's KV is identical whether computed alone or within a full
prompt prefill, so greedy token streams must match the uncached engine
bit-exactly, on hits and misses alike.
"""

import dataclasses

import numpy as np
import pytest

import jax

from tts_inference_tpu.config import (
    Config, EngineConfig, ModelConfig, SamplingConfig, StreamConfig,
)
from tts_inference_tpu.engine.engine import EngineCore
from tts_inference_tpu.models import llama
from tts_inference_tpu.ops import sampling as S

CFG = ModelConfig.tiny(vocab_size=512)
BASE = EngineConfig(
    max_batch_size=4, max_input_len=32, max_output_len=96,
    prefill_buckets=(8, 16, 32), kv_buckets=(32, 64),
    decode_steps_per_call=4,
)
PREFIX = dataclasses.replace(BASE, prefix_cache=True)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def greedy_sp(batch=4):
    return S.SamplingParams.from_config(SamplingConfig(greedy=True), batch)


def gen(core, prompts, slots, n_extra=2):
    """Admit prompts and decode a few calls; returns (B, T) token matrix."""
    sp = greedy_sp(core.batch)
    core.seed_slots(slots, [1000 + s for s in slots])
    toks0, tok, act = core.prefill_decode_launch(
        prompts, slots, sp,
        np.zeros(core.batch, np.int32), np.zeros(core.batch, bool), n=3,
    )
    chunks = [np.asarray(toks0)]
    for _ in range(n_extra):
        t, tok, act = core.decode_steps_launch(sp, tok, act)
        chunks.append(np.asarray(t))
    return np.concatenate(chunks, axis=1)


VOICE_HEADER = [101, 102, 103, 104, 105, 106]  # shared "{voice}: " tokens


def test_prefix_cached_matches_uncached(params):
    prompts = [VOICE_HEADER + [7, 8, 9, 10, 11],
               VOICE_HEADER + [13, 14, 15]]
    a = gen(EngineCore(params, CFG, PREFIX, eos_id=5), prompts, [0, 1])
    b = gen(EngineCore(params, CFG, BASE, eos_id=5), prompts, [0, 1])
    np.testing.assert_array_equal(a[:2], b[:2])


def test_second_request_hits_and_matches(params):
    """The VERDICT item: a second same-voice request skips recomputing the
    shared prefix (hit counter) and produces identical output."""
    core = EngineCore(params, CFG, PREFIX, eos_id=5)
    prompt = [VOICE_HEADER + [7, 8, 9, 10, 11, 12]]
    first = gen(core, prompt, [0])
    assert core.prefix_misses == 1 and core.prefix_hits == 0
    core.reset_slots([0])
    second = gen(core, prompt, [0])
    assert core.prefix_hits == 1 and core.prefix_misses == 1
    np.testing.assert_array_equal(first[0], second[0])


def test_partial_prefix_share(params):
    """Same voice header, different text: the header is reused only when
    the first prefix_len tokens match (whole-prefix key). With prompts
    longer than prefix_len, two texts sharing 32 leading tokens hit."""
    long_header = list(range(200, 240))   # 40 tokens > prefix_len=32
    core = EngineCore(params, CFG, PREFIX, eos_id=5)
    gen(core, [long_header + [7, 8]], [0])
    core.reset_slots([0])
    gen(core, [long_header + [9, 10, 11]], [0])
    assert core.prefix_hits == 1  # first 32 tokens identical


def test_lru_eviction(params):
    ecfg = dataclasses.replace(PREFIX, prefix_entries=2)
    core = EngineCore(params, CFG, ecfg, eos_id=5)
    p = lambda base: [[base + i for i in range(8)]]  # noqa: E731
    gen(core, p(10), [0])                    # miss → entry A
    core.reset_slots([0])
    gen(core, p(20), [0])                    # miss → entry B
    core.reset_slots([0])
    gen(core, p(30), [0])                    # miss → evicts A
    core.reset_slots([0])
    assert core.prefix_misses == 3
    out_evicted = gen(core, p(10), [0])      # A evicted → miss again
    assert core.prefix_misses == 4
    core.reset_slots([0])
    # and the rebuilt entry still matches the uncached engine
    want = gen(EngineCore(params, CFG, BASE, eos_id=5), p(10), [0])
    np.testing.assert_array_equal(out_evicted[0], want[0])


def test_short_prompt_bypasses_cache(params):
    core = EngineCore(params, CFG, PREFIX, eos_id=5)
    out = gen(core, [[7, 8, 9]], [0])  # len-1 = 2 < MIN_PREFIX
    assert core.prefix_hits == 0 and core.prefix_misses == 0
    want = gen(EngineCore(params, CFG, BASE, eos_id=5), [[7, 8, 9]], [0])
    np.testing.assert_array_equal(out[0], want[0])


def test_prefix_with_int8_kv(params):
    """int8 KV cache composes: the prefix pool stores quantized KV+scales;
    per-position quantization is position-local so outputs still match the
    uncached int8 engine exactly."""
    i8 = dataclasses.replace(BASE, kv_cache_int8=True)
    i8p = dataclasses.replace(PREFIX, kv_cache_int8=True)
    prompts = [VOICE_HEADER + [7, 8, 9, 10]]
    a = gen(EngineCore(params, CFG, i8p, eos_id=5), prompts, [0])
    b = gen(EngineCore(params, CFG, i8, eos_id=5), prompts, [0])
    np.testing.assert_array_equal(a[0], b[0])


def test_prefill_slots_path(params):
    """The scheduler's admission path (non-fused prefill_slots) also routes
    through the prefix cache."""
    core = EngineCore(params, CFG, PREFIX, eos_id=5)
    sp = greedy_sp()
    prompt = [VOICE_HEADER + [44, 45, 46, 47]]
    first_a = core.prefill_slots(prompt, [0], sp)
    assert core.prefix_misses == 1
    core.reset_slots([0])
    first_b = core.prefill_slots(prompt, [0], sp)
    assert core.prefix_hits == 1
    assert first_a[0] == first_b[0]
    base_core = EngineCore(params, CFG, BASE, eos_id=5)
    want = base_core.prefill_slots(prompt, [0], sp)
    assert first_a[0] == want[0]


def test_scheduler_with_prefix_cache_matches():
    """End-to-end: scheduler streams with prefix caching equal the
    non-prefix scheduler streams (same-voice requests reuse the header)."""
    from tests.test_scheduler import drain, mk_req, run_until_idle
    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import Runtime
    from tts_inference_tpu.config import tiny_config

    def run(prefix):
        cfg = tiny_config()
        if prefix:
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, prefix_cache=True))
        rt = Runtime.create(cfg, seed=0)
        s = Scheduler(rt.engine.core.params, rt.config, rt.vocoder,
                      rt.tokenizer)
        reqs = [mk_req("same text for all", seed=50 + i) for i in range(3)]
        for r in reqs:
            s.submit(r)
        run_until_idle(s)
        s.drain_vocoder()
        out = [drain(r) for r in reqs]
        hits = s.core.prefix_hits
        s.stop()
        return out, hits

    with_prefix, hits = run(True)
    without, _ = run(False)
    assert hits >= 2  # identical prompts: first misses, rest hit
    for (pcm_a, m_a), (pcm_b, m_b) in zip(with_prefix, without):
        assert m_a.tokens == m_b.tokens
        assert pcm_a == pcm_b


@pytest.mark.slow
def test_warmup_compiles_prefix_graphs(params):
    core = EngineCore(params, CFG, PREFIX, eos_id=5)
    info = core.warmup_graphs()
    assert info["warmed_buckets"] == list(PREFIX.prefill_buckets)
