"""Fused first-chunk vocode (TTFA fast path): the first audio chunk's
extraction + SNAC decode are chained onto the engine's first-burst dispatch
device-to-device (streaming/pipeline.py _first_pcm_fn). These tests pin:

- bit-exactness vs the host decode path (same chunks, same bytes)
- graceful fallback when the burst is not clean (EOS inside the burst)
- no activation without force_speech (prompt does not end in SOS)
"""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SamplingConfig, StreamConfig
from tts_inference_tpu.runtime import create_tiny_runtime

AUDIO_RANGE = (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)


@pytest.fixture(scope="module")
def rt():
    return create_tiny_runtime(seed=0)


def _stream(rt, fused, **kw):
    rt.pipeline.fuse_first_chunk = fused
    try:
        chunks = list(rt.pipeline.stream("fused chunk test", "tara", **kw))
    finally:
        rt.pipeline.fuse_first_chunk = True
    return chunks, rt.pipeline.last_metrics


def test_fused_first_chunk_bit_exact(rt):
    sampling = SamplingConfig(max_tokens=7 * 10, seed=2,
                              token_range=AUDIO_RANGE)
    a, ma = _stream(rt, True, sampling=sampling, force_speech=True)
    b, mb = _stream(rt, False, sampling=sampling, force_speech=True)
    assert [c.pcm for c in a] == [c.pcm for c in b]
    assert ma.tokens == mb.tokens and ma.chunks == mb.chunks
    # the fused graph was actually built and used
    assert rt.pipeline._first_pcm_cache


def test_fused_falls_back_on_eos_in_burst(rt):
    """max_tokens smaller than the burst → EOS/truncation inside the first
    dispatch → ok=False → host path output, still correct."""
    sampling = SamplingConfig(max_tokens=7 * 2, seed=3,
                              token_range=AUDIO_RANGE)
    a, _ = _stream(rt, True, sampling=sampling, force_speech=True)
    b, _ = _stream(rt, False, sampling=sampling, force_speech=True)
    assert [c.pcm for c in a] == [c.pcm for c in b]


def test_no_fuse_without_force_speech(rt):
    """Without force_speech the prompt lacks a trailing SOS; the hook must
    not arm (extractor not started) and streaming still works."""
    cache_before = dict(rt.pipeline._first_pcm_cache)
    sampling = SamplingConfig(max_tokens=7 * 6, seed=4,
                              token_range=AUDIO_RANGE)
    rt.pipeline.fuse_first_chunk = True
    chunks = list(rt.pipeline.stream(
        "no sos", "tara", sampling, force_speech=False
    ))
    # no new fused graphs compiled for this stream
    assert set(rt.pipeline._first_pcm_cache) == set(cache_before)
    assert isinstance(chunks, list)
