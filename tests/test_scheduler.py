"""Continuous-batching scheduler tests (tiny runtime, CPU).

BASELINE.json config #4 is "1–64 concurrent streams with continuous
batching"; these tests check the correctness half: isolation under churn,
fairness, cancellation, and bit-identical output vs the single-stream path.
"""

import queue
import threading

import numpy as np
import pytest

from tts_inference_tpu import protocol as P
from tts_inference_tpu.config import SamplingConfig, StreamConfig, tiny_config
from tts_inference_tpu.engine.scheduler import Scheduler, TTSRequest
from tts_inference_tpu.runtime import create_tiny_runtime

AUDIO_RANGE = (P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB)
SCFG = StreamConfig(frames_per_chunk=2, lookahead_frames=3,
                    left_context_frames=4)


def mk_sampling(seed, max_tokens=35):
    return SamplingConfig(
        max_tokens=max_tokens, seed=seed, token_range=AUDIO_RANGE
    )


def mk_req(text, seed, max_tokens=35):
    return TTSRequest(
        text=text, sampling=mk_sampling(seed, max_tokens),
        stream_cfg=SCFG, force_speech=True,
    )


@pytest.fixture(scope="module")
def rt():
    return create_tiny_runtime(seed=0)


@pytest.fixture(scope="module")
def sched(rt):
    s = Scheduler(
        rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer
    )
    yield s


def drain(req, timeout=300):
    chunks = []
    while True:
        kind, payload = req.events.get(timeout=timeout)
        if kind == "chunk":
            chunks.append(payload.pcm)
        elif kind == "done":
            return b"".join(chunks), payload
        else:
            raise AssertionError(payload)


def run_until_idle(sched, max_iters=2000):
    for _ in range(max_iters):
        if not sched.step() and sched.n_queued == 0:
            return
    raise AssertionError("scheduler did not drain")


def test_single_request_matches_single_stream_engine(rt, sched):
    req = mk_req("match me", seed=11)
    sched.submit(req)
    run_until_idle(sched)
    pcm, metrics = drain(req)
    assert metrics.tokens == 35 and metrics.frames == 5

    # identical request through the single-stream pipeline
    offline, m2 = rt.pipeline.synthesize(
        "match me", "tara", mk_sampling(11), SCFG, force_speech=True
    )
    assert m2.tokens == 35
    np.testing.assert_array_equal(
        np.frombuffer(pcm, np.int16), np.frombuffer(offline, np.int16)
    )


def test_concurrent_requests_all_complete(sched):
    reqs = [mk_req(f"req {i}", seed=100 + i, max_tokens=21 + 7 * i)
            for i in range(6)]  # 6 requests > 4 slots → queueing
    for r in reqs:
        sched.submit(r)
    run_until_idle(sched)
    for i, r in enumerate(reqs):
        pcm, m = drain(r)
        assert m.tokens == 21 + 7 * i, (i, m.tokens)
        assert len(pcm) == (m.tokens // 7) * P.SAMPLES_PER_FRAME * 2


def test_isolation_under_churn(rt, sched):
    """A request's audio must be identical whether it runs alone or while
    neighbors are admitted/evicted around it — the masked-write property."""
    solo = mk_req("isolation probe", seed=42, max_tokens=42)
    sched.submit(solo)
    run_until_idle(sched)
    want, _ = drain(solo)

    probe = mk_req("isolation probe", seed=42, max_tokens=42)
    noise = [mk_req(f"noise {i}", seed=7 + i, max_tokens=14 + 7 * (i % 3))
             for i in range(8)]
    sched.submit(noise[0])
    sched.submit(probe)
    for r in noise[1:]:
        sched.submit(r)
    run_until_idle(sched)
    got, _ = drain(probe)
    for r in noise:
        drain(r)
    # tokens are bit-identical; audio may differ by 1 int16 LSB where the
    # batched vocoder call's conv tiling rounds differently than the solo
    # call (float non-associativity at a quantization boundary)
    a = np.frombuffer(got, np.int16).astype(np.int32)
    b = np.frombuffer(want, np.int16).astype(np.int32)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 1, np.abs(a - b).max()


def test_cancellation_frees_slot(sched):
    req = mk_req("cancel me", seed=9, max_tokens=10**6)
    req.sampling = SamplingConfig(max_tokens=7 * 50, seed=9,
                                  token_range=AUDIO_RANGE)
    sched.submit(req)
    sched.step()   # admit
    req.cancel()
    sched.step()   # notices cancel, frees slot
    sched.drain_vocoder()
    kinds = []
    while True:
        try:
            # the done event rides the async vocode FIFO
            kind, _ = req.events.get(timeout=10)
            kinds.append(kind)
            if kind == "done":
                break
        except queue.Empty:
            break
    assert "done" in kinds
    assert sched.n_active == 0


def test_threaded_run_loop(sched):
    sched.start()
    try:
        reqs = [mk_req(f"threaded {i}", seed=200 + i) for i in range(3)]
        outs = []
        for r in reqs:
            sched.submit(r)
        for r in reqs:
            pcm, m = drain(r, timeout=300)
            outs.append((pcm, m))
        assert all(m.tokens == 35 for _, m in outs)
    finally:
        sched.stop()


def test_finished_at_admission_emits_done(sched):
    """A request whose prefill-sampled token already finishes it
    (max_tokens=1) must still get its done event — the round-1 bug left the
    consumer hanging until request_timeout_s (ADVICE r1, high)."""
    req = mk_req("one token only", seed=3, max_tokens=1)
    sched.submit(req)
    run_until_idle(sched)
    sched.drain_vocoder()
    pcm, metrics = drain(req, timeout=30)
    assert metrics.tokens == 1


def test_fail_all_delivers_errors(rt):
    s2 = Scheduler(rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer)
    r1, r2 = mk_req("a", 1), mk_req("b", 2)
    s2.submit(r1)
    s2.step()          # r1 admitted
    s2.submit(r2)      # r2 still pending
    s2.fail_all("boom")
    for r in (r1, r2):
        kind, payload = r.events.get_nowait()
        assert kind == "error" and "boom" in payload
    assert s2.n_active == 0 and s2.pending.empty()


def test_mixed_sampling_configs_per_slot(rt, sched):
    """Heterogeneous requests share one decode graph: greedy, sampled,
    audio-only, and frame-protocol requests run concurrently and each obeys
    its own contract."""
    reqs = [
        TTSRequest(text="greedy", sampling=SamplingConfig(
            greedy=True, max_tokens=21, repetition_penalty=1.0,
            token_range=AUDIO_RANGE, seed=1), stream_cfg=SCFG,
            force_speech=True),
        TTSRequest(text="sampled", sampling=mk_sampling(2, 28),
                   stream_cfg=SCFG, force_speech=True),
        TTSRequest(text="structured", sampling=SamplingConfig(
            max_tokens=29, seed=3, frame_protocol=True), stream_cfg=SCFG),
    ]
    for r in reqs:
        sched.submit(r)
    run_until_idle(sched)
    sched.drain_vocoder()
    outs = [drain(r) for r in reqs]
    # greedy + sampled obey audio_only token budget exactly
    assert outs[0][1].tokens == 21 and outs[0][1].frames == 3
    assert outs[1][1].tokens == 28 and outs[1][1].frames == 4
    # structured: SOS consumed 1 token; remaining form complete valid frames
    m = outs[2][1]
    assert m.frames == (m.tokens - 1) // 7
    assert len(outs[2][0]) == m.frames * P.SAMPLES_PER_FRAME * 2


def test_vocoder_failure_delivers_errors(rt):
    """An exception inside the batched vocode decode must surface as an
    'error' event on every affected stream, not hang consumers — with the
    two-stage worker the failure can happen at launch OR at fetch."""
    s2 = Scheduler(rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer)
    try:
        def boom(*a, **k):
            raise RuntimeError("vocoder exploded")

        s2.vocoder = type(rt.vocoder)(
            rt.vocoder.params, rt.vocoder.cfg
        )
        s2.vocoder.decode_frames_batch_launch = boom
        req = mk_req("will fail", seed=5, max_tokens=35)
        s2.submit(req)
        run_until_idle(s2)
        s2.drain_vocoder(timeout=30)
        kinds = []
        while True:
            try:
                kind, payload = req.events.get(timeout=5)
            except Exception:
                break
            kinds.append(kind)
            if kind in ("done", "error"):
                break
        assert "error" in kinds, kinds
    finally:
        s2.stop()


# -- admission QoS under oversubscription (round-2 verdict item #4) ----------
# Reference roadmap target: ~100 concurrent users (spec.md:137-139). Strict
# FIFO gives every request the same multi-second p95 TTFA once the queue
# exceeds the slots; these tests pin the sjf policy, the aging starvation
# bound, and the reserved short-only slots.

import dataclasses


def qos_scheduler(rt, **engine_over):
    cfg = rt.config.replace(
        engine=dataclasses.replace(rt.config.engine, **engine_over)
    )
    return Scheduler(
        rt.engine.core.params, cfg, rt.vocoder, rt.tokenizer
    )


def test_sjf_short_jumps_queue(rt):
    """With all slots busy on long jobs, a short request submitted AFTER a
    long one is admitted first once a slot frees."""
    s = qos_scheduler(rt, admission_policy="sjf",
                      short_request_tokens=14)
    admitted = []
    orig = s.core.prefill_decode_launch

    def spy(prompts, slots, *a, **k):
        admitted.append(list(slots))
        return orig(prompts, slots, *a, **k)

    s.core.prefill_decode_launch = spy
    try:
        # staggered lengths → slots free one at a time, so each admission
        # wave has exactly one free slot and policy order is observable
        firsts = [mk_req(f"long {i}", seed=i, max_tokens=70 + 28 * i)
                  for i in range(4)]
        for r in firsts:
            s.submit(r)
        # admit the first wave (fills all 4 slots)
        for _ in range(50):
            s.step()
            if s.n_active == 4:
                break
        assert s.n_active == 4
        late_long = mk_req("late long", seed=90, max_tokens=70)
        short = mk_req("short vip", seed=91, max_tokens=14)
        s.submit(late_long)   # FIFO-first
        s.submit(short)       # submitted after, but shorter
        # run until either queued request lands in a slot
        for _ in range(2000):
            s.step()
            live = [st.req for st in s.slots if st is not None]
            if short in live or late_long in live:
                break
        live = [st.req for st in s.slots if st is not None]
        assert short in live, "short request never admitted"
        assert late_long not in live, \
            "sjf should admit the short before the earlier long"
        run_until_idle(s)
        s.drain_vocoder(timeout=60)
        for r in firsts + [late_long, short]:
            drain(r)
    finally:
        s.stop()


def test_sjf_aging_bounds_starvation(rt):
    """A long request that has waited past sjf_aging_ms outranks a fresh
    short one (no starvation)."""
    import time as _t

    s = qos_scheduler(rt, admission_policy="sjf",
                      short_request_tokens=14,
                      sjf_aging_ms=10.0)   # age fast for the test
    try:
        firsts = [mk_req(f"long {i}", seed=i, max_tokens=70)
                  for i in range(4)]
        for r in firsts:
            s.submit(r)
        for _ in range(50):
            s.step()
            if s.n_active == 4:
                break
        old_long = mk_req("old long", seed=92, max_tokens=70)
        s.submit(old_long)
        _t.sleep(0.15)   # ages >> 10 ms → effective length strongly negative
        fresh_short = mk_req("fresh short", seed=93, max_tokens=14)
        s.submit(fresh_short)
        for _ in range(2000):
            s.step()
            live = [st.req for st in s.slots if st is not None]
            if old_long in live:
                break
        live = [st.req for st in s.slots if st is not None]
        assert old_long in live, "aged long starved by fresh short"
        run_until_idle(s)
        s.drain_vocoder(timeout=60)
        for r in firsts + [old_long, fresh_short]:
            drain(r)
    finally:
        s.stop()


def test_reserved_short_slots_exclude_long(rt):
    """Long requests may only occupy the general slots; a short request
    lands in the reserved slot even with longs queued ahead of it."""
    s = qos_scheduler(rt, reserved_short_slots=1,
                      short_request_tokens=14)
    try:
        longs = [mk_req(f"long {i}", seed=40 + i, max_tokens=70)
                 for i in range(5)]
        for r in longs:
            s.submit(r)
        for _ in range(200):
            s.step()
            if s.n_active >= 3:
                break
        # 4 slots, 1 reserved → at most 3 longs admitted, slot 3 stays free
        assert s.n_active == 3
        assert s.slots[3] is None
        short = mk_req("short", seed=50, max_tokens=14)
        s.submit(short)
        for _ in range(2000):
            s.step()
            if s.slots[3] is not None:
                break
        assert s.slots[3] is not None and s.slots[3].req is short
        run_until_idle(s)
        s.drain_vocoder(timeout=60)
        for r in longs + [short]:
            drain(r)
    finally:
        s.stop()


def test_qos_cancelled_backlog_request_dropped(rt):
    """Cancelling a queued (not yet admitted) request under sjf delivers
    'done' and removes it from the backlog."""
    s = qos_scheduler(rt, admission_policy="sjf",
                      short_request_tokens=14)
    try:
        firsts = [mk_req(f"long {i}", seed=i, max_tokens=140)
                  for i in range(4)]
        for r in firsts:
            s.submit(r)
        for _ in range(50):
            s.step()
            if s.n_active == 4:
                break
        victim = mk_req("cancel me", seed=60, max_tokens=35)
        s.submit(victim)
        for _ in range(3):
            s.step()
        assert not any(st is not None and st.req is victim
                       for st in s.slots), "victim admitted too early"
        victim.cancel()
        run_until_idle(s)
        s.drain_vocoder(timeout=60)
        assert s.n_queued == 0
        kind, _ = victim.events.get(timeout=5)
        assert kind == "done"
        for r in firsts:
            drain(r)
    finally:
        s.stop()


def test_fifo_default_unchanged(rt):
    """Default policy stays strict FIFO: a later short does NOT jump an
    earlier long."""
    s = qos_scheduler(rt)   # fifo, no reservations
    try:
        firsts = [mk_req(f"long {i}", seed=i, max_tokens=70)
                  for i in range(4)]
        for r in firsts:
            s.submit(r)
        for _ in range(50):
            s.step()
            if s.n_active == 4:
                break
        late_long = mk_req("late long", seed=70, max_tokens=70)
        short = mk_req("short", seed=71, max_tokens=14)
        s.submit(late_long)
        s.submit(short)
        for _ in range(2000):
            s.step()
            live = [st.req for st in s.slots if st is not None]
            if late_long in live or short in live:
                break
        live = [st.req for st in s.slots if st is not None]
        assert late_long in live, "FIFO must admit in arrival order"
        run_until_idle(s)
        s.drain_vocoder(timeout=60)
        for r in firsts + [late_long, short]:
            drain(r)
    finally:
        s.stop()


def test_tick_profile_accumulates(sched):
    """enable_tick_profile attributes step() phases (the 64-slot knee
    measurement tooling, PERF.md round 3) and is inert until enabled."""
    assert sched.tick_profile is None
    sched.enable_tick_profile()
    req = mk_req("profile me", seed=77)
    sched.submit(req)
    run_until_idle(sched)
    drain(req)
    prof = sched.tick_profile
    assert prof is not None and prof["ticks"] > 0
    for key in ("fetch_s", "host_tokens_s", "fused_pcm_s",
                "vocode_plan_s", "admit_launch_s"):
        assert prof[key] >= 0.0
    # the decode fetch is a real phase of every tick with live slots
    assert prof["fetch_s"] > 0.0
    sched._prof = None  # leave the module-scoped fixture clean
