"""Fused admission vocode (scheduler twin of the pipeline's fused first
chunk): each admitted slot's first-chunk SNAC decode is chained onto the
admission dispatch (scheduler._launch_admit_pcm). Pins bit-exactness vs the
host vocode-worker path and the fallback when the burst is too short."""

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SamplingConfig, StreamConfig, tiny_config
from tts_inference_tpu.engine.scheduler import Scheduler, TTSRequest
from tts_inference_tpu.runtime import create_tiny_runtime

AUDIO_RANGE = (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)
SCFG = StreamConfig(frames_per_chunk=2, lookahead_frames=3,
                    left_context_frames=4)


@pytest.fixture(scope="module")
def rt():
    return create_tiny_runtime(seed=0)


@pytest.fixture(scope="module")
def sched(rt):
    s = Scheduler(
        rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer
    )
    # make the admission burst cover the 28-token first chunk (the tiny
    # config's default 2*7 is too short — production uses 2*14)
    s.admission_steps = 28
    s.start()
    yield s
    s.stop()


def mk_req(text, seed, max_tokens=70):
    return TTSRequest(
        text=text, sampling=SamplingConfig(
            max_tokens=max_tokens, seed=seed, token_range=AUDIO_RANGE),
        stream_cfg=SCFG, force_speech=True, noise_seed=seed,
    )


def drain(req, timeout=300):
    chunks, metrics = [], None
    while True:
        kind, payload = req.events.get(timeout=timeout)
        if kind == "chunk":
            chunks.append(payload.pcm)
        elif kind == "done":
            metrics = payload
            break
        else:
            raise AssertionError(payload)
    return chunks, metrics


def _run(sched, fused, seeds):
    sched.fuse_admission_vocode = fused
    try:
        reqs = [mk_req(f"fused admit {s}", s) for s in seeds]
        for r in reqs:
            sched.submit(r)
        return [drain(r) for r in reqs]
    finally:
        sched.fuse_admission_vocode = True


def test_fused_admission_bit_exact(sched):
    a = _run(sched, True, [11, 12, 13])
    b = _run(sched, False, [11, 12, 13])
    for (ca, ma), (cb, mb) in zip(a, b):
        assert ca == cb            # identical PCM chunk bytes
        assert ma.tokens == mb.tokens
    # the fused graph was actually built (admission covered the chunk)
    assert sched._pcm_cache


def test_fused_admission_falls_back_short_burst(sched):
    """max_tokens below the first-chunk need → not eligible → host path."""
    def short(fused):
        sched.fuse_admission_vocode = fused
        try:
            r = mk_req("short", 21, max_tokens=14)
            sched.submit(r)
            return drain(r)
        finally:
            sched.fuse_admission_vocode = True

    a, b = short(True), short(False)
    assert a[0] == b[0]


def test_fused_admission_under_churn(sched):
    """Admissions landing while neighbors are mid-generation: the fused
    first chunk must stay bit-exact per stream and never perturb running
    neighbors (same guarantee as masked admission)."""
    import time as _t

    def run(fused):
        sched.fuse_admission_vocode = fused
        try:
            first = [mk_req(f"wave1 {s}", s) for s in (31, 32)]
            for r in first:
                sched.submit(r)
            _t.sleep(0.3)   # wave 2 admits while wave 1 is decoding
            second = [mk_req(f"wave2 {s}", s) for s in (33, 34)]
            for r in second:
                sched.submit(r)
            return [drain(r) for r in first + second]
        finally:
            sched.fuse_admission_vocode = True

    a, b = run(True), run(False)
    for (ca, ma), (cb, mb) in zip(a, b):
        # chunk BOUNDARIES are timing-dependent (a busy tick may emit a
        # larger first chunk). Sample VALUES may differ by one int16 LSB:
        # XLA's batched convs give float-LSB (~5e-9) different results at
        # different row counts, and the fused graph decodes at B rows
        # while the worker buckets to pow2(#jobs) — measured, inherent to
        # batched decode (the host path varies the same way between waves)
        pa = np.frombuffer(b"".join(ca), np.int16).astype(np.int32)
        pb = np.frombuffer(b"".join(cb), np.int16).astype(np.int32)
        assert pa.shape == pb.shape
        assert np.abs(pa - pb).max() <= 1
        assert ma.tokens == mb.tokens


def test_unwarmed_geometry_falls_back_after_warmup(sched):
    """ADVICE r2 (medium): once warmup has run, a request whose first-chunk
    geometry was never warmed must take the vocode-worker path (no cold jit
    compile on the scheduler thread) and still complete correctly."""
    sched._pcm_warmed = True          # simulate post-warmup state
    cached = dict(sched._pcm_cache)
    try:
        r = TTSRequest(
            text="odd geometry", force_speech=True, noise_seed=5,
            sampling=SamplingConfig(max_tokens=70, seed=5,
                                    token_range=AUDIO_RANGE),
            stream_cfg=StreamConfig(frames_per_chunk=2, lookahead_frames=1,
                                    left_context_frames=4,
                                    first_chunk_lookahead=0),
        )
        sched.submit(r)
        chunks, m = drain(r)
        assert m.tokens > 0 and chunks
        # no new fused graph was compiled for the unwarmed geometry
        assert set(sched._pcm_cache) == set(cached)
    finally:
        sched._pcm_warmed = False


def test_admission_steps_cover_default_first_chunk():
    """ADVICE r2 (low): at production defaults the fused admission path must
    be geometrically eligible (admission burst covers the first chunk)."""
    from tts_inference_tpu import protocol
    from tts_inference_tpu.config import Config

    cfg = Config()
    scfg = cfg.stream
    la = (scfg.first_chunk_lookahead
          if scfg.first_chunk_lookahead is not None
          else scfg.lookahead_frames)
    n_codes = (scfg.first_chunk_frames + la) * protocol.FRAME_SIZE
    # mirror Scheduler.__init__'s sizing without building an engine
    admission_steps = max(2 * cfg.engine.decode_steps_per_call, n_codes - 1)
    assert n_codes <= admission_steps + 1
