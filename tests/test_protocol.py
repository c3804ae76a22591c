"""Protocol layer tests: constants, prompt, extraction, de-interleave.

Mirrors the reference's invariant checks in helpers/analyze_tokens.py
(per-position offset validation) and its SOS-extraction ablations.
"""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P


def make_frame(rng, n_frames=1):
    """Random valid interleaved codes for n frames."""
    codes = []
    for _ in range(n_frames):
        for p in range(P.FRAME_SIZE):
            codes.append(int(rng.integers(0, P.CODEBOOK_SIZE)) + P.POSITION_OFFSETS[p])
    return codes


def test_constants():
    assert P.TOKEN_SOS == 128257
    assert P.TOKEN_EOS == 128258
    assert P.TOKEN_SOH == 128259
    assert P.TOKEN_EOT == 128009
    assert P.TOKEN_EOH == 128260
    assert P.TOKEN_DELIMITER == 128261
    assert P.TOKEN_AUDIO_BASE == 128266
    assert P.FRAME_SIZE == 7
    assert P.SAMPLE_RATE == 24000
    assert P.SAMPLES_PER_FRAME == 2048
    assert P.AUDIO_VOCAB == 28672


def test_prompt_format():
    ids = P.format_prompt_ids([10, 11, 12])
    assert ids == [128259, 10, 11, 12, 128009, 128260]
    forced = P.format_prompt_ids([10], force_speech=True)
    assert forced == [128259, 10, 128009, 128260, 128261, 128257]


def test_audio_duration():
    assert P.audio_duration_s(7) == pytest.approx(2048 / 24000)
    assert P.audio_duration_s(6) == 0.0
    # reference build math: 12000 tokens ≈ 145 s (build_engine.py:158-162)
    assert P.audio_duration_s(12000) == pytest.approx(146.28, abs=0.5)


def test_extractor_first_sos(rng):
    codes = make_frame(rng, 2)
    toks = [111, 222, P.TOKEN_SOS] + [c + P.TOKEN_AUDIO_BASE for c in codes] + [P.TOKEN_EOS, 999]
    out = P.extract_audio_codes(toks)
    assert out == codes


def test_extractor_ignores_preamble_and_stops_at_eos(rng):
    ex = P.TokenExtractor()
    assert ex.feed(123) == []
    assert ex.feed(P.TOKEN_SOS) == []
    code = make_frame(rng)[0]
    assert ex.feed(code + P.TOKEN_AUDIO_BASE) == [code]
    assert ex.feed(P.TOKEN_EOS) == []
    assert ex.finished
    assert ex.feed(code + P.TOKEN_AUDIO_BASE) == []


def test_extractor_last_sos(rng):
    seg1 = make_frame(rng)
    seg2 = make_frame(rng, 2)
    toks = (
        [P.TOKEN_SOS]
        + [c + P.TOKEN_AUDIO_BASE for c in seg1]
        + [P.TOKEN_DELIMITER, P.TOKEN_SOS]
        + [c + P.TOKEN_AUDIO_BASE for c in seg2]
        + [P.TOKEN_EOS]
    )
    assert P.extract_audio_codes(toks, strategy="last_sos") == seg2
    assert P.extract_audio_codes(toks, strategy="first_sos") == seg1 + seg2


def test_deinterleave_roundtrip(rng):
    codes = np.array(make_frame(rng, 5), dtype=np.int32)
    l1, l2, l3 = P.deinterleave_frames(codes)
    assert l1.shape == (5,) and l2.shape == (10,) and l3.shape == (20,)
    assert (l1 >= 0).all() and (l1 < 4096).all()
    assert (l2 >= 0).all() and (l2 < 4096).all()
    assert (l3 >= 0).all() and (l3 < 4096).all()
    rebuilt = P.interleave_frames(l1, l2, l3)
    np.testing.assert_array_equal(rebuilt, codes)


def test_deinterleave_routing():
    # Frame with distinguishable codes: position p carries value p (plus offset)
    frame = [p * P.CODEBOOK_SIZE + p for p in range(7)]
    l1, l2, l3 = P.deinterleave_frames(frame)
    assert l1.tolist() == [0]
    assert l2.tolist() == [1, 4]
    assert l3.tolist() == [2, 3, 5, 6]


def test_deinterleave_clamps_invalid():
    # Hindi-model tokens can go out of range; reference clamps (modal_audio_stream.py:185-190)
    frame = [P.CODEBOOK_SIZE * 7 + 5, 0, 0, 0, 0, 0, 0]  # pos0 too big, rest negative after offset
    l1, l2, l3 = P.deinterleave_frames(frame)
    assert l1[0] == P.CODEBOOK_SIZE - 1
    assert (l2 == 0).all() and (l3 == 0).all()


def test_deinterleave_drops_partial_frame(rng):
    codes = make_frame(rng, 2)[:10]  # 1 complete frame + 3 extra
    l1, l2, l3 = P.deinterleave_frames(codes)
    assert l1.shape == (1,)


def test_validate_frame_offsets(rng):
    codes = make_frame(rng, 3)
    assert P.validate_frame_offsets(codes) == []
    codes[8] = 0  # position 1 must be in [4096, 8192)
    assert P.validate_frame_offsets(codes) == [8]
