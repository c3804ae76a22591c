"""Sliced LM head (protocol.HEAD_SLICE_BASE): the decode head computes only
rows ≥ 128000 (specials + audio vocab — everything a TTS generation can
legitimately emit; the reference's extractor instead DROPS sub-audio tokens
after the fact, tensorrt_tts/inference.py:54-93).

Covers:
- sample(base=...) equivalence: sliced logits + base ≡ full logits with the
  sub-slice rows forced to -inf (token ids, state updates identical)
- compute_logits(base) equals the matching slice of the full head
- engine-level bit-exactness: sliced_head on vs off produces identical token
  streams under structured decoding (frame_protocol / token_range)
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tts_inference_tpu import protocol
from tts_inference_tpu.config import SamplingConfig, tiny_config
from tts_inference_tpu.engine.engine import GenerationEngine
from tts_inference_tpu.models import llama
from tts_inference_tpu.ops import sampling as S

BASE = protocol.HEAD_SLICE_BASE
VOCAB = 156940


def _params(cfg):
    return llama.init_llama_params(jax.random.PRNGKey(0), cfg)


def test_sample_base_equivalence_structured():
    """sample(sliced, base) ≡ sample(full) when everything below the slice
    is already unsampleable (structured token_range inside the slice)."""
    rng = np.random.default_rng(2)
    full = jnp.asarray(rng.normal(size=(2, VOCAB)), jnp.float32)
    sc = SamplingConfig(
        token_range=(protocol.TOKEN_AUDIO_BASE,
                     protocol.TOKEN_AUDIO_BASE + protocol.AUDIO_VOCAB),
        seed=11,
    )
    params = S.SamplingParams.from_config(sc, 2)
    st = S.init_sampling_state(2, VOCAB, seed=5)
    tok_full, st_full = S.sample(full, params, st)
    tok_sl, st_sl = S.sample(full[:, BASE:], params, st, base=BASE)
    np.testing.assert_array_equal(np.asarray(tok_full), np.asarray(tok_sl))
    np.testing.assert_array_equal(
        np.asarray(st_full.presence), np.asarray(st_sl.presence)
    )
    np.testing.assert_array_equal(
        np.asarray(st_full.frame_pos), np.asarray(st_sl.frame_pos)
    )
    assert int(tok_full[0]) >= protocol.TOKEN_AUDIO_BASE


def test_sample_base_greedy_matches_when_argmax_in_slice():
    rng = np.random.default_rng(3)
    full = np.asarray(rng.normal(size=(1, VOCAB)), np.float32)
    full[0, BASE + 777] = 50.0  # force argmax into the slice
    params = S.SamplingParams.from_config(SamplingConfig(greedy=True), 1)
    st = S.init_sampling_state(1, VOCAB)
    tok_full, _ = S.sample(jnp.asarray(full), params, st)
    tok_sl, _ = S.sample(jnp.asarray(full[:, BASE:]), params, st, base=BASE)
    assert int(tok_full[0]) == int(tok_sl[0]) == BASE + 777


def test_compute_logits_base_is_a_slice():
    cfg = tiny_config().model
    p = _params(cfg)
    hidden = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, cfg.hidden_size)),
        llama.param_dtype(cfg),
    )
    full = llama.compute_logits(p, cfg, hidden)
    sliced = llama.compute_logits(p, cfg, hidden, BASE)
    assert sliced.shape == (2, cfg.vocab_size - BASE)
    np.testing.assert_allclose(
        np.asarray(full[:, BASE:]), np.asarray(sliced), rtol=1e-5, atol=1e-5
    )


def test_engine_sliced_head_bit_exact_under_frame_protocol():
    cfg = tiny_config()
    p = _params(cfg.model)
    prompt = protocol.format_prompt_ids(list(range(300, 330)))
    sc = SamplingConfig(max_tokens=30, frame_protocol=True, seed=9)

    def run(sliced):
        ecfg = dataclasses.replace(cfg.engine, sliced_head=sliced)
        eng = GenerationEngine(p, cfg.model, ecfg, seed=7)
        res = eng.generate(prompt, sc)
        assert eng.core.logits_base == (BASE if sliced else 0)
        return res.token_ids

    assert run(True) == run(False)


def test_engine_sliced_head_only_emits_protocol_tokens():
    """Even unstructured, the sliced head can only emit ids ≥ BASE — the
    protocol-correctness guard the flag documents."""
    cfg = tiny_config()
    p = _params(cfg.model)
    eng = GenerationEngine(p, cfg.model, cfg.engine, seed=1)
    res = eng.generate(
        protocol.format_prompt_ids([500, 501]),
        SamplingConfig(max_tokens=20, seed=2),
    )
    assert res.token_ids and all(t >= BASE for t in res.token_ids)
