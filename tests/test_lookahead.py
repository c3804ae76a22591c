"""Streaming-vs-batch quality tests.

The reference's thresholds (PIPELINE_REPORT.md:513-519): MSE < 1e-3,
correlation > 0.998, max-diff < 0.5, std-ratio > 0.95 — implemented in its
(missing) test_streaming_audio_quality.py: generate tokens once, decode both
ways, compare. Our windowed decoder is designed to be BIT-EXACT, so we assert
exactness and also report the reference's statistical thresholds.
"""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SnacConfig, StreamConfig
from tts_inference_tpu.models import snac as jsnac
from tts_inference_tpu.streaming.lookahead import LookaheadStreamingDecoder

torch = pytest.importorskip("torch")
from tests.torch_snac_ref import TorchSnacRef  # noqa: E402

TINY = SnacConfig(
    latent_dim=32, decoder_dim=64, decoder_rates=(8, 8, 4, 2),
    codebook_size=64, codebook_dim=4, noise=True, depthwise=True,
)


@pytest.fixture(scope="module")
def decoder():
    from tts_inference_tpu.models.loader import load_snac_torch_state

    torch.manual_seed(0)
    params = load_snac_torch_state(TorchSnacRef(TINY).eval().state_dict(), TINY)
    return jsnac.SnacDecoder(params, TINY, frame_buckets=(8, 16, 32, 64, 128))


def make_codes(rng, n_frames):
    """Valid interleaved codes for the tiny codebook."""
    out = []
    for _ in range(n_frames):
        for p in range(P.FRAME_SIZE):
            out.append(int(rng.integers(0, TINY.codebook_size)) + P.POSITION_OFFSETS[p])
    return out


def batch_decode(decoder, codes, seed=0):
    l1, l2, l3 = P.deinterleave_frames(np.asarray(codes, np.int32))
    return decoder.decode_frames(l1, l2, l3, noise_seed=seed, first_frame=0)


@pytest.mark.parametrize("lookahead", [3, 5])
def test_streaming_bitexact_vs_batch(decoder, lookahead):
    rng = np.random.default_rng(0)
    n_frames = 40
    codes = make_codes(rng, n_frames)
    full = batch_decode(decoder, codes, seed=7)

    la = LookaheadStreamingDecoder(
        decoder,
        StreamConfig(frames_per_chunk=5, lookahead_frames=lookahead,
                     left_context_frames=4),
        noise_seed=7,
    )
    chunks = []
    # feed token-by-token like the streaming hot loop
    for i in range(0, len(codes), P.FRAME_SIZE):
        la.feed(codes[i : i + P.FRAME_SIZE])
        out = la.poll()
        if out is not None:
            chunks.append(out)
    tail = la.flush()
    if tail is not None:
        chunks.append(tail)
    got = np.concatenate(chunks)

    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, atol=2e-5)

    # the reference's own statistical thresholds, for the record:
    mse = float(np.mean((got - full) ** 2))
    corr = float(np.corrcoef(got, full)[0, 1])
    std_ratio = float(got.std() / full.std())
    assert mse < 1e-3 and corr > 0.998 and std_ratio > 0.95
    assert np.abs(got - full).max() < 0.5


def test_streaming_is_linear_work(decoder):
    """Windowed decode does O(n) total frames vs the reference's O(n²)."""
    rng = np.random.default_rng(1)
    n_frames = 60
    cfgs = StreamConfig(frames_per_chunk=5, lookahead_frames=3,
                        left_context_frames=4)
    la = LookaheadStreamingDecoder(decoder, cfgs, noise_seed=0)
    codes = make_codes(rng, n_frames)
    for i in range(0, len(codes), P.FRAME_SIZE):
        la.feed(codes[i : i + P.FRAME_SIZE])
        la.poll()
    la.flush()
    # reference-style decode-from-zero would decode ~ sum_k (5k) ≈ n²/10 frames;
    # windowed total must stay within a small constant factor of n
    assert la.frames_decoded_total <= 4 * n_frames, la.frames_decoded_total


def test_zero_lookahead_still_runs(decoder):
    """lookahead=0 (the reference's ablation low end) must run; output is
    complete even if edge samples would differ from batch decode."""
    rng = np.random.default_rng(2)
    codes = make_codes(rng, 12)
    la = LookaheadStreamingDecoder(
        decoder,
        StreamConfig(frames_per_chunk=2, lookahead_frames=0,
                     left_context_frames=4),
    )
    la.feed(codes)
    chunks = [la.poll(), la.flush()]
    total = sum(len(c) for c in chunks if c is not None)
    assert total == 12 * TINY.samples_per_frame


def test_flush_without_enough_frames(decoder):
    la = LookaheadStreamingDecoder(decoder, StreamConfig())
    la.feed(make_codes(np.random.default_rng(3), 1))
    assert la.poll() is None
    out = la.flush()
    assert out is not None and len(out) == TINY.samples_per_frame
    assert la.flush() is None  # idempotent


def test_empty_flush(decoder):
    la = LookaheadStreamingDecoder(decoder, StreamConfig())
    assert la.poll() is None
    assert la.flush() is None


def test_progressive_first_chunk_lookahead(decoder):
    """first_chunk_lookahead=1 emits the first chunk 2 frames earlier; all
    subsequent chunks remain bit-exact vs batch decode."""
    rng = np.random.default_rng(7)
    codes = make_codes(rng, 20)
    full = batch_decode(decoder, codes, seed=0)

    la = LookaheadStreamingDecoder(
        decoder,
        StreamConfig(frames_per_chunk=2, first_chunk_frames=1,
                     lookahead_frames=3, first_chunk_lookahead=1,
                     left_context_frames=4),
        noise_seed=0,
    )
    first_at = None
    chunks = []
    for f in range(20):
        la.feed(codes[f * P.FRAME_SIZE : (f + 1) * P.FRAME_SIZE])
        out = la.poll()
        if out is not None:
            if first_at is None:
                first_at = f
            chunks.append(out)
    tail = la.flush()
    if tail is not None:
        chunks.append(tail)
    # first emission after 2 frames buffered (1 chunk + 1 lookahead),
    # vs 4 with the regular lookahead
    assert first_at == 1
    got = np.concatenate(chunks)
    assert got.shape == full.shape
    spf = decoder.cfg.samples_per_frame
    # everything past the first chunk is still exact
    np.testing.assert_allclose(got[spf:], full[spf:], atol=2e-5)
    # the first chunk deviates only within the influence reach and mildly
    err = np.abs(got[:spf] - full[:spf])
    assert err.max() < 0.5 and float((err ** 2).mean()) < 1e-3


def test_chunk_phase_same_audio_different_boundaries(decoder):
    """chunk_phase (the scheduler's burst de-phasing, PERF.md round 5)
    delays the SECOND chunk boundary only — the emitted audio matches the
    unphased stream within float ULP (different window lengths land in
    different decode buckets, whose conv-as-matmul tilings accumulate in
    different orders; ≤1 int16 LSB after quantization, the same bound the
    scheduler's isolation test uses)."""
    rng = np.random.default_rng(3)
    codes = make_codes(rng, 30)
    cfg = StreamConfig(frames_per_chunk=4, lookahead_frames=3,
                       left_context_frames=4)

    def run(phase):
        la = LookaheadStreamingDecoder(decoder, cfg, noise_seed=5)
        la.chunk_phase = phase
        sizes, parts = [], []
        step = P.FRAME_SIZE * 2
        for i in range(0, len(codes), step):
            la.feed(codes[i: i + step])
            out = la.poll()
            if out is not None:
                parts.append(out)
                sizes.append(len(out))
        out = la.flush()
        if out is not None:
            parts.append(out)
            sizes.append(len(out))
        return np.concatenate(parts), sizes

    base, sizes0 = run(0)
    phased, sizes2 = run(2)
    assert base.shape == phased.shape
    assert np.abs(base - phased).max() < 2e-6        # float ULP scale
    q = np.round(np.clip(base, -1, 1) * 32767).astype(np.int32)
    p16 = np.round(np.clip(phased, -1, 1) * 32767).astype(np.int32)
    assert np.abs(q - p16).max() <= 1                # ≤1 int16 LSB
    assert sizes0 != sizes2                  # boundaries really moved
    # the phase SHRINKS the second chunk (an earlier boundary, never a
    # longer wait), then cadence returns to frames_per_chunk
    assert sizes2[1] < sizes0[1]
