"""End-to-end slice test: text → prompt → decode → extract → vocoder → PCM.

BASELINE.json config #1: "Single English utterance, batch=1 greedy decode →
vocoder → WAV on CPU (matches inference.py output)". Runs on the tiny
random-weight runtime (no assets), with force_speech + audio-only sampling
so random weights still yield a full audio pipeline.
"""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SamplingConfig, StreamConfig
from tts_inference_tpu.runtime import create_tiny_runtime
from tts_inference_tpu.utils.audio import duration_s, read_wav, wav_bytes

AUDIO_RANGE = (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)


@pytest.fixture(scope="module")
def rt():
    return create_tiny_runtime(seed=0)


def test_synthesize_end_to_end(rt, tmp_path):
    sampling = SamplingConfig(max_tokens=7 * 10, seed=1, token_range=AUDIO_RANGE)
    pcm, m = rt.pipeline.synthesize(
        "hello world", "tara", sampling, force_speech=True
    )
    n_frames = (7 * 10) // P.FRAME_SIZE
    assert len(pcm) == n_frames * P.SAMPLES_PER_FRAME * 2
    assert m.tokens == 70 and m.frames == 10
    assert m.ttfa_ms > 0 and m.ttft_ms > 0 and m.rtf > 0
    # WAV roundtrip
    out = tmp_path / "o.wav"
    out.write_bytes(wav_bytes(pcm))
    audio, rate = read_wav(str(out))
    assert rate == P.SAMPLE_RATE and len(audio) == n_frames * P.SAMPLES_PER_FRAME


def test_stream_chunks_and_batch_agree(rt):
    """Streaming chunks concatenated == batch synthesize (same seed) —
    the reference's streaming-vs-batch quality test, here bit-exact."""
    sampling = SamplingConfig(max_tokens=7 * 12, seed=2, token_range=AUDIO_RANGE)
    scfg = StreamConfig(frames_per_chunk=2, lookahead_frames=3,
                        left_context_frames=4)
    chunks = list(rt.pipeline.stream(
        "stream me", "tara", sampling, scfg, force_speech=True
    ))
    assert len(chunks) >= 3
    stream_pcm = b"".join(c.pcm for c in chunks)
    m1 = rt.pipeline.last_metrics

    batch_pcm, m2 = rt.pipeline.synthesize(
        "stream me", "tara", sampling,
        StreamConfig(frames_per_chunk=10**6, lookahead_frames=3,
                     left_context_frames=4),
        force_speech=True,
    )
    assert m1.tokens == m2.tokens  # same seed → same tokens
    a = np.frombuffer(stream_pcm, np.int16)
    b = np.frombuffer(batch_pcm, np.int16)
    np.testing.assert_array_equal(a, b)


def test_metrics_wire_payload(rt):
    sampling = SamplingConfig(max_tokens=21, seed=3, token_range=AUDIO_RANGE)
    rt.pipeline.synthesize("x", "tara", sampling, force_speech=True)
    wire = rt.pipeline.last_metrics.as_wire()
    for key in ("server_ttft_ms", "server_ttfa_ms", "server_rtf",
                "tokens", "tokens_per_sec", "decode_times_ms"):
        assert key in wire


def test_without_sos_no_audio(rt):
    """Without force_speech, random weights never emit SOS → zero audio but
    clean termination (the SOS gate works)."""
    sampling = SamplingConfig(max_tokens=14, seed=4, token_range=AUDIO_RANGE)
    pcm, m = rt.pipeline.synthesize("no gate", "tara", sampling)
    assert pcm == b""
    assert m.chunks == 0


def test_cli_generate_tiny(tmp_path):
    from tts_inference_tpu.cli import main

    out = tmp_path / "cli.wav"
    rc = main([
        "generate", "--tiny", "--cpu", "--no-warmup",
        "--text", "cli smoke", "--output", str(out),
        "--max-tokens", "35", "--force-speech", "--audio-only",
        "--seed", "5",
    ])
    assert rc == 0
    audio, rate = read_wav(str(out))
    assert rate == P.SAMPLE_RATE
    assert len(audio) == 5 * P.SAMPLES_PER_FRAME


def test_last_sos_restart_drops_buffered_segment(rt):
    """A mid-stream SOS with last_sos extraction discards un-emitted frames
    (segments must not mix); protocol layer exposes restart_count."""
    from tts_inference_tpu import protocol as P2

    ex = P2.TokenExtractor(restart_on_sos=True)
    ex.feed(P2.TOKEN_SOS)
    frame = [p * P2.CODEBOOK_SIZE + 1 + P2.TOKEN_AUDIO_BASE for p in range(7)]
    ex.feed_many(frame)
    assert ex.restart_count == 0 and len(ex.codes) == 7
    ex.feed(P2.TOKEN_SOS)
    assert ex.restart_count == 1 and len(ex.codes) == 0


def test_quantized_runtime_synthesizes():
    """int8 weight-only runtime runs the full pipeline end-to-end."""
    from tts_inference_tpu.config import SamplingConfig, tiny_config
    from tts_inference_tpu.runtime import Runtime

    rt = Runtime.create(tiny_config(), seed=0, quantize=True)
    pcm, m = rt.pipeline.synthesize(
        "int8 check", "tara",
        SamplingConfig(max_tokens=21, seed=6, token_range=AUDIO_RANGE),
        force_speech=True,
    )
    assert m.tokens == 21 and len(pcm) == 3 * P.SAMPLES_PER_FRAME * 2


def test_cli_engine_geometry_flags(tmp_path):
    from tts_inference_tpu.cli import main

    out = tmp_path / "geo.wav"
    rc = main([
        "generate", "--tiny", "--cpu", "--no-warmup",
        "--text", "geometry", "--output", str(out),
        "--max-tokens", "14", "--force-speech", "--audio-only",
        "--max-input-len", "32", "--max-output-len", "128",
        "--prefill-buckets", "16,32", "--seed", "2",
    ])
    assert rc == 0 and out.exists()


def test_frame_protocol_end_to_end(rt):
    """frame_protocol generates protocol-valid frames from random weights
    with no clamping (structured decoding through the whole pipeline)."""
    from tts_inference_tpu.config import SamplingConfig, StreamConfig

    sampling = SamplingConfig(max_tokens=36, seed=9, frame_protocol=True)
    pcm, m = rt.pipeline.synthesize(
        "structured", "tara", sampling,
        StreamConfig(frames_per_chunk=2, lookahead_frames=3),
    )
    # SOS is forced by the grammar itself (not by the prompt); EOS only at
    # boundaries, so frames are always complete
    assert m.frames >= 1
    assert len(pcm) == m.frames * P.SAMPLES_PER_FRAME * 2
