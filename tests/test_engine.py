"""Engine tests: streaming vs batch equality, EOS stop, bucket invariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import EngineConfig, ModelConfig, SamplingConfig
from tts_inference_tpu.engine.engine import EngineCore, GenerationEngine
from tts_inference_tpu.models import llama

CFG = ModelConfig.tiny(vocab_size=512)
ECFG = EngineConfig(
    max_input_len=32, max_output_len=96, max_batch_size=2,
    prefill_buckets=(8, 16, 32),
)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def mkengine(params, eos=511, seed=0):
    return GenerationEngine(params, CFG, ECFG, eos_id=eos, seed=seed)


def test_generate_deterministic_and_streaming_equal(params):
    eng = mkengine(params, seed=3)
    prompt = [1, 2, 3, 4, 5]
    samp = SamplingConfig(temperature=0.8, top_p=0.9, max_tokens=40, seed=0)
    r1 = eng.generate(prompt, samp)
    r2 = eng.generate(prompt, samp)
    assert r1.token_ids == r2.token_ids
    chunks = list(eng.stream(prompt, samp))
    flat = [t for c in chunks for t in c]
    assert flat == r1.token_ids


def test_greedy_engine_matches_manual_loop(params):
    eng = mkengine(params)
    prompt = [7, 8, 9]
    res = eng.generate(prompt, SamplingConfig(greedy=True, max_tokens=12))

    # manual argmax loop with raw model calls
    cache = llama.init_kv_cache(CFG, 1, ECFG.max_seq_len)
    logits, cache = llama.prefill(
        params, CFG, jnp.asarray([prompt + [0] * 5], jnp.int32),
        jnp.asarray([3], jnp.int32), cache,
    )
    want = []
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for _ in range(12):
        want.append(int(tok[0]))
        if want[-1] == 511:
            break
        logits, cache = llama.decode_one(params, CFG, tok, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
    # repetition penalty differs (engine default applies 1.1)… use no penalty
    res2 = eng.generate(
        prompt,
        SamplingConfig(greedy=True, max_tokens=12, repetition_penalty=1.0),
    )
    assert res2.token_ids[: len(want)] == want


def test_eos_stops_generation(params):
    """Force a prompt whose greedy continuation hits EOS id quickly by
    scanning a few prompts; assert the engine stops and marks finished."""
    eng = mkengine(params, eos=None or 511)
    # With random weights EOS may not appear: emulate by setting eos to the
    # first token the model greedily produces.
    first = eng.generate([5, 6], SamplingConfig(greedy=True, max_tokens=1))
    eos = first.token_ids[0]
    eng2 = mkengine(params, eos=eos)
    res = eng2.generate([5, 6], SamplingConfig(greedy=True, max_tokens=50,
                                               repetition_penalty=1.0))
    assert res.finished
    assert res.token_ids == [eos]


def test_max_tokens_cap(params):
    eng = mkengine(params)
    res = eng.generate([1], SamplingConfig(max_tokens=9, seed=1))
    assert len(res.token_ids) <= 9 + ECFG.decode_steps_per_call
    assert res.timings["tokens"] == len(res.token_ids)


def test_bucket_invariance(params):
    """Same prompt produces identical greedy tokens whatever bucket it lands
    in (padding must not leak into attention)."""
    samp = SamplingConfig(greedy=True, max_tokens=10, repetition_penalty=1.0)
    eng_small = GenerationEngine(
        params, CFG,
        EngineConfig(max_input_len=32, max_output_len=96,
                     prefill_buckets=(8,)),
        eos_id=511,
    )
    eng_big = GenerationEngine(
        params, CFG,
        EngineConfig(max_input_len=32, max_output_len=96,
                     prefill_buckets=(32,)),
        eos_id=511,
    )
    p = [3, 1, 4, 1, 5]
    assert eng_small.generate(p, samp).token_ids == \
        eng_big.generate(p, samp).token_ids


def test_multi_slot_core_isolation(params):
    """Two slots decode independently: running a second prompt in slot 1
    does not change slot 0's greedy continuation."""
    from tts_inference_tpu.ops import sampling as S

    core = EngineCore(params, CFG, ECFG, batch_size=2, eos_id=511)
    sp = S.SamplingParams.from_config(
        SamplingConfig(greedy=True, repetition_penalty=1.0), 2
    )
    t0 = core.prefill_slots([[1, 2, 3]], [0], sp)
    toks_a, tok, act = core.decode_steps(
        sp, t0, np.array([True, False]), n=6
    )
    solo = toks_a[0].tolist()

    core2 = EngineCore(params, CFG, ECFG, batch_size=2, eos_id=511)
    t0b = core2.prefill_slots([[1, 2, 3], [9, 9, 9, 9]], [0, 1], sp)
    assert t0b[0] == t0[0]
    toks_b, _, _ = core2.decode_steps(
        sp, t0b, np.array([True, True]), n=6
    )
    assert toks_b[0].tolist() == solo


def test_warmup_compiles(params):
    eng = mkengine(params)
    info = eng.warmup()
    assert any(k.startswith("compile_decode_w") for k in info)
    assert any(k.startswith("compile_prefill_decode_") for k in info)
    # post-warmup generation still correct
    res = eng.generate([2, 4, 6], SamplingConfig(greedy=True, max_tokens=5,
                                                 repetition_penalty=1.0))
    assert len(res.token_ids) >= 1


def test_int8_kv_cache_engine(params):
    """Engine runs end to end with kv_cache_int8; token budget exact."""
    ecfg_q = EngineConfig(
        max_input_len=32, max_output_len=96, max_batch_size=2,
        prefill_buckets=(8, 16, 32), kv_cache_int8=True,
    )
    eng = GenerationEngine(params, CFG, ecfg_q, eos_id=511, seed=1)
    res = eng.generate([1, 2, 3], SamplingConfig(max_tokens=20, seed=4))
    assert len(res.token_ids) == 20 or res.finished
