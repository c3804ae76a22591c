"""Native (C++) runtime tests: equivalence vs the Python reference semantics
in protocol.py."""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.utils import native as N

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native toolchain unavailable"
)


def rand_tokens(rng, n=300):
    """Mixed stream: specials, text tokens, audio tokens, out-of-range."""
    kinds = rng.integers(0, 5, size=n)
    toks = []
    for k in kinds:
        if k == 0:
            toks.append(int(rng.integers(0, 1000)))
        elif k == 1:
            toks.append(P.TOKEN_SOS if rng.random() < 0.3 else P.TOKEN_DELIMITER)
        elif k == 4 and rng.random() < 0.02:
            toks.append(P.TOKEN_EOS)
        else:
            toks.append(P.TOKEN_AUDIO_BASE + int(rng.integers(0, P.AUDIO_VOCAB + 50)))
    return toks


@pytest.mark.parametrize("restart", [False, True])
def test_extractor_equivalence(restart, rng):
    toks = rand_tokens(rng)
    py = P.TokenExtractor(restart_on_sos=restart)
    nat = N.NativeExtractor(restart_on_sos=restart)
    got_py, got_nat = [], []
    for i in range(0, len(toks), 11):
        chunk = toks[i : i + 11]
        got_py.extend(py.feed_many(chunk))
        got_nat.extend(nat.feed_many(chunk))
    assert got_nat == got_py
    assert nat.finished == py.finished
    assert nat.total_codes == len(py.codes)
    if py.codes:
        np.testing.assert_array_equal(
            nat.codes_range(0, len(py.codes)), np.asarray(py.codes)
        )


def test_deinterleave_equivalence(rng):
    codes = []
    for _ in range(50):
        for p in range(7):
            codes.append(int(rng.integers(-100, P.AUDIO_VOCAB + 100)))
    l1p, l2p, l3p = P.deinterleave_frames(codes)
    l1n, l2n, l3n = N.native_deinterleave(codes)
    np.testing.assert_array_equal(l1n, l1p)
    np.testing.assert_array_equal(l2n, l2p)
    np.testing.assert_array_equal(l3n, l3p)


def test_emission_window_matches_lookahead_logic():
    spf = 2048
    # not enough pending frames → nothing
    assert N.native_emission_window(0, 6, spf, 5, 4, 2, False) is None
    # enough: emitted 0, total 10, lookahead 3 → stable 7 frames
    w = N.native_emission_window(0, 10, spf, 3, 4, 2, False)
    assert w == (0, 10, 0, 7 * spf)
    # mid-stream: emitted 7 frames, total 14 → w0 = 7-4 = 3
    w = N.native_emission_window(7 * spf, 14, spf, 3, 4, 2, False)
    assert w == (3, 14, 4 * spf, 8 * spf)
    # flush emits the tail regardless of chunk granularity
    w = N.native_emission_window(7 * spf, 9, spf, 3, 4, 2, True)
    assert w == (3, 9, 4 * spf, 6 * spf)
    # flush with nothing left
    assert N.native_emission_window(9 * spf, 9, spf, 3, 4, 2, True) is None


def test_native_restart_count_matches_python(rng):
    from tts_inference_tpu import protocol
    from tts_inference_tpu.utils.native import NativeExtractor, available

    if not available():
        import pytest

        pytest.skip("native runtime unavailable")
    toks = [protocol.TOKEN_SOS, 128266 + 5, 128266 + 4096,
            protocol.TOKEN_SOS, 128266 + 9, protocol.TOKEN_SOS,
            128266 + 11, protocol.TOKEN_EOS]
    py = protocol.TokenExtractor(restart_on_sos=True)
    nat = NativeExtractor(restart_on_sos=True)
    a, b = py.feed_many(toks), nat.feed_many(toks)
    assert a == b
    assert py.restart_count == nat.restart_count == 2
    assert py.finished and nat.finished


def test_scheduler_native_path_matches_python():
    """--native-protocol: identical streams through the C++ extractor +
    deinterleave (the scheduler hot-path wiring, VERDICT r1 item 8)."""
    from tests.test_scheduler import drain, mk_req, run_until_idle
    from tts_inference_tpu.engine.scheduler import Scheduler
    from tts_inference_tpu.runtime import create_tiny_runtime
    from tts_inference_tpu.utils.native import available

    if not available():
        import pytest

        pytest.skip("native runtime unavailable")
    rt = create_tiny_runtime(seed=0)

    def run(use_native):
        s = Scheduler(rt.engine.core.params, rt.config, rt.vocoder,
                      rt.tokenizer, use_native=use_native)
        reqs = [mk_req(f"native {i}", seed=90 + i) for i in range(3)]
        for r in reqs:
            s.submit(r)
        run_until_idle(s)
        s.drain_vocoder()
        out = [drain(r) for r in reqs]
        s.stop()
        return out

    native = run(True)
    python = run(False)
    for (pcm_a, m_a), (pcm_b, m_b) in zip(native, python):
        assert m_a.tokens == m_b.tokens
        assert pcm_a == pcm_b
