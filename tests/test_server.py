"""Serving-layer tests: wire-protocol contracts against the tiny runtime.

Each test speaks the exact protocol the reference's surviving benchmark
clients use (comprehensive_sweep.py:118-210), so green here means those
clients run unmodified.
"""

import asyncio
import base64
import io
import json
import wave

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import WSMsgType  # noqa: E402
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from tts_inference_tpu import protocol as P  # noqa: E402
from tts_inference_tpu.runtime import create_tiny_runtime  # noqa: E402
from tts_inference_tpu.serving.app import create_app  # noqa: E402

REQ = {
    "text": "hello websocket",
    "voice": "tara",
    "temperature": 0.6,
    "top_p": 0.95,
    "frames_per_chunk": 2,
    "benchmark": True,
    "force_speech": True,
    "audio_only": True,
    "lookahead_frames": 3,
    "max_tokens": 70,
    "seed": 7,
}


@pytest.fixture(scope="module")
def rt():
    return create_tiny_runtime(seed=0)


@pytest.fixture()
def client(rt, event_loop=None):
    loop = asyncio.new_event_loop()
    app = create_app(rt)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def test_index_and_health(client):
    c, loop = client

    async def go():
        r = await c.get("/")
        info = await r.json()
        assert "/ws/tts" in info["endpoints"]
        h = await (await c.get("/health")).json()
        assert h["status"] == "ok"
        m = await (await c.get("/metrics")).json()
        assert m["service"] == "tts_inference_tpu"
        assert m["mode"] in ("single", "scheduler")
        assert "requests_served" in m and "uptime_s" in m
        t = await c.get("/test")
        assert "WebSocket" in await t.text()

    loop.run_until_complete(go())


def test_ws_tts_binary_protocol(client):
    """The comprehensive_sweep.py exchange: JSON request → binary chunks →
    done JSON with server_metrics."""
    c, loop = client

    async def go():
        ws = await c.ws_connect("/ws/tts")
        await ws.send_json(REQ)
        chunks, done = [], None
        while True:
            msg = await ws.receive(timeout=180)
            if msg.type == WSMsgType.BINARY:
                chunks.append(msg.data)
            elif msg.type == WSMsgType.TEXT:
                data = json.loads(msg.data)
                assert "error" not in data, data
                if data.get("done"):
                    done = data
                    break
            else:
                raise AssertionError(msg)
        await ws.close()
        return chunks, done

    chunks, done = loop.run_until_complete(go())
    assert len(chunks) >= 2
    total = sum(len(c_) for c_ in chunks)
    assert done["chunks"] == len(chunks)
    assert done["bytes"] == total
    # 70 tokens → 10 frames → 10*2048 samples *2 bytes
    assert total == 10 * P.SAMPLES_PER_FRAME * 2
    sm = done["server_metrics"]
    for k in ("server_ttft_ms", "server_ttfa_ms", "server_rtf",
              "tokens_per_sec"):
        assert k in sm, sm
    assert sm["tokens"] == 70


def test_ws_audio_base64_protocol(client):
    c, loop = client

    async def go():
        ws = await c.ws_connect("/ws/audio")
        await ws.send_json(REQ)
        chunks, eos = [], None
        while True:
            msg = await ws.receive(timeout=180)
            data = json.loads(msg.data)
            assert "error" not in data, data
            if data.get("event") == "EOS":
                eos = data
                break
            chunks.append((data["chunk_index"], base64.b64decode(data["audio"])))
        await ws.close()
        return chunks, eos

    chunks, eos = loop.run_until_complete(go())
    assert eos["total_chunks"] == len(chunks)
    assert [i for i, _ in chunks] == list(range(1, len(chunks) + 1))


def test_ws_token_debug(client):
    c, loop = client

    async def go():
        ws = await c.ws_connect("/ws")
        await ws.send_json({**REQ, "max_tokens": 10})
        toks, eos = [], None
        while True:
            msg = await ws.receive(timeout=180)
            data = json.loads(msg.data)
            if data.get("event") == "EOS":
                eos = data
                break
            toks.extend(data["tokens"])
        await ws.close()
        return toks, eos

    toks, eos = loop.run_until_complete(go())
    assert eos["total_tokens"] == len(toks) >= 10


def test_generate_wav_and_headers(client):
    c, loop = client

    async def go():
        r = await c.post("/generate", json=REQ)
        body = await r.read()
        return r, body

    r, body = loop.run_until_complete(go())
    assert r.status == 200
    assert r.headers["Content-Type"] == "audio/wav"
    for h in ("X-TTFT-Ms", "X-TTFA-Ms", "X-Audio-Duration-Ms",
              "X-Total-Time-Ms", "X-Decode-Time-Ms", "X-Real-Time-Factor",
              "X-Chunks"):
        assert h in r.headers, h
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == P.SAMPLE_RATE
        assert w.getnframes() == 10 * P.SAMPLES_PER_FRAME


def test_generate_batch_headers(client):
    c, loop = client

    async def go():
        r = await c.post("/generate-batch", json=REQ)
        await r.read()
        return r

    r = loop.run_until_complete(go())
    assert r.status == 200
    assert r.headers["X-Tokens"] == "70"
    assert r.headers["X-Frames"] == "10"


def test_generate_errors(client):
    c, loop = client

    async def go():
        r1 = await c.post("/generate", json={"text": ""})
        r2 = await c.post("/generate", data=b"not json")
        # without force_speech random weights emit no SOS → no audio → 500
        r3 = await c.post("/generate", json={
            "text": "x", "max_tokens": 10, "seed": 1, "audio_only": True,
        })
        return r1.status, r2.status, r3.status, await r3.json()

    s1, s2, s3, body3 = loop.run_until_complete(go())
    assert s1 == 400 and s2 == 400 and s3 == 500
    assert "error" in body3


def test_dump_tokens(client):
    c, loop = client

    async def go():
        r = await c.post("/dump-tokens", json={**REQ, "max_tokens": 8})
        return r.status, await r.json()

    status, data = loop.run_until_complete(go())
    assert status == 200
    assert data["prompt_ids"][0] == P.TOKEN_SOH
    assert len(data["token_ids"]) >= 8
    assert "tokens_per_sec" in data["timings"]


def test_ws_tts_streaming_equals_batch_decode(client, rt):
    """End-to-end audio over the wire equals an offline synthesize with the
    same seed — the full-stack version of the streaming-quality test."""
    c, loop = client

    async def go():
        ws = await c.ws_connect("/ws/tts")
        await ws.send_json(REQ)
        chunks = []
        while True:
            msg = await ws.receive(timeout=180)
            if msg.type == WSMsgType.BINARY:
                chunks.append(msg.data)
            else:
                if json.loads(msg.data).get("done"):
                    break
        await ws.close()
        return b"".join(chunks)

    wire = loop.run_until_complete(go())

    from tts_inference_tpu.config import SamplingConfig, StreamConfig

    sampling = SamplingConfig(
        temperature=0.6, top_p=0.95, max_tokens=70, seed=7,
        token_range=(P.TOKEN_AUDIO_BASE, P.TOKEN_AUDIO_BASE + P.AUDIO_VOCAB),
    )
    offline, _ = rt.pipeline.synthesize(
        "hello websocket", "tara", sampling,
        StreamConfig(frames_per_chunk=2, lookahead_frames=3),
        force_speech=True,
    )
    np.testing.assert_array_equal(
        np.frombuffer(wire, np.int16), np.frombuffer(offline, np.int16)
    )


def test_multistream_concurrent_ws(rt):
    """Scheduler mode: two concurrent WS streams both complete with correct
    audio (no 503, no interleaving corruption)."""
    from tts_inference_tpu.engine.scheduler import Scheduler

    sched = Scheduler(
        rt.engine.core.params, rt.config, rt.vocoder, rt.tokenizer
    )
    sched.start()
    loop = asyncio.new_event_loop()
    app = create_app(rt, scheduler=sched)
    c = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        async def one(seed, max_tokens):
            ws = await c.ws_connect("/ws/tts")
            await ws.send_json({**REQ, "seed": seed, "max_tokens": max_tokens})
            chunks = []
            while True:
                msg = await ws.receive(timeout=300)
                if msg.type == WSMsgType.BINARY:
                    chunks.append(msg.data)
                else:
                    data = json.loads(msg.data)
                    assert "error" not in data, data
                    if data.get("done"):
                        break
            await ws.close()
            return b"".join(chunks)

        async def both():
            return await asyncio.gather(one(21, 35), one(22, 70))

        a, b = loop.run_until_complete(both())
        assert len(a) == 5 * P.SAMPLES_PER_FRAME * 2
        assert len(b) == 10 * P.SAMPLES_PER_FRAME * 2
    finally:
        loop.run_until_complete(c.close())
        loop.close()
        sched.stop()


def test_disconnect_mid_stream_then_recover(rt):
    """Abruptly closing the socket mid-stream must not wedge the server:
    the next request completes normally (single-stream mode)."""
    loop = asyncio.new_event_loop()
    c = TestClient(TestServer(create_app(rt)), loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        async def go():
            ws = await c.ws_connect("/ws/tts")
            await ws.send_json({**REQ, "max_tokens": 140})
            # read a single frame then vanish
            await ws.receive(timeout=180)
            await ws.close()

            # server must accept and serve a fresh request afterwards
            ws2 = await c.ws_connect("/ws/tts")
            await ws2.send_json({**REQ, "max_tokens": 35})
            got = 0
            while True:
                msg = await ws2.receive(timeout=180)
                if msg.type == WSMsgType.BINARY:
                    got += len(msg.data)
                else:
                    data = json.loads(msg.data)
                    if data.get("error"):
                        # single-stream mode may briefly report busy while
                        # the abandoned generation drains — retry once
                        await asyncio.sleep(3)
                        await ws2.send_json({**REQ, "max_tokens": 35})
                        continue
                    if data.get("done"):
                        break
            await ws2.close()
            return got

        got = loop.run_until_complete(go())
        assert got == 5 * P.SAMPLES_PER_FRAME * 2
    finally:
        loop.run_until_complete(c.close())
        loop.close()


def test_disconnect_mid_stream_scheduler_mode(rt):
    from tts_inference_tpu.engine.scheduler import Scheduler

    sched = Scheduler(rt.engine.core.params, rt.config, rt.vocoder,
                      rt.tokenizer)
    sched.start()
    loop = asyncio.new_event_loop()
    c = TestClient(TestServer(create_app(rt, scheduler=sched)), loop=loop)
    loop.run_until_complete(c.start_server())
    try:
        async def go():
            ws = await c.ws_connect("/ws/tts")
            await ws.send_json({**REQ, "max_tokens": 700, "seed": 31})
            await ws.receive(timeout=300)
            await ws.close()   # cancellation should free the slot

            ws2 = await c.ws_connect("/ws/tts")
            await ws2.send_json({**REQ, "max_tokens": 35, "seed": 32})
            got = 0
            while True:
                msg = await ws2.receive(timeout=300)
                if msg.type == WSMsgType.BINARY:
                    got += len(msg.data)
                else:
                    data = json.loads(msg.data)
                    assert "error" not in data, data
                    if data.get("done"):
                        break
            await ws2.close()
            return got

        got = loop.run_until_complete(go())
        assert got == 5 * P.SAMPLES_PER_FRAME * 2
    finally:
        loop.run_until_complete(c.close())
        loop.close()
        sched.stop()


def test_parse_request_capacity_limits():
    """Hard caps from reference spec.md:133-135 (2000 chars / 120 s audio)."""
    from tts_inference_tpu.config import SamplingConfig, StreamConfig
    from tts_inference_tpu.serving.app import AUDIO_RANGE, parse_request

    defaults = SamplingConfig(max_tokens=10_000_000)
    sdefaults = StreamConfig()

    text, voice, sampling, stream_cfg, opts = parse_request(
        {"text": "x" * (P.MAX_TEXT_CHARS + 500), "max_tokens": 10_000_000},
        defaults, sdefaults,
    )
    assert len(text) == P.MAX_TEXT_CHARS
    # 120 s of audio = 120*24000/2048 frames * 7 tokens/frame
    cap = int(P.MAX_AUDIO_SECONDS * P.SAMPLE_RATE
              / P.SAMPLES_PER_FRAME * P.FRAME_SIZE)
    assert sampling.max_tokens == cap
    assert voice == "tara" and not opts["benchmark"]

    # under-cap request passes through untouched
    _, _, s2, _, _ = parse_request({"text": "hi", "max_tokens": 70},
                                   defaults, sdefaults)
    assert s2.max_tokens == 70

    # audio_only restricts the sampled-token range
    _, _, s3, _, _ = parse_request({"text": "hi", "audio_only": True},
                                   defaults, sdefaults)
    assert s3.token_range == AUDIO_RANGE

    # per-request stream overrides land in the StreamConfig
    _, _, _, sc, _ = parse_request(
        {"text": "hi", "frames_per_chunk": 9, "lookahead_frames": 2},
        defaults, sdefaults,
    )
    assert sc.frames_per_chunk == 9 and sc.lookahead_frames == 2


def test_parse_request_casts_and_clamps_wire_values():
    """ADVICE r2 (high): client-controllable stream geometry reaches jit
    tracing — a float or negative wire value must be cast/clamped in
    parse_request, never raise inside the scheduler's admission wave."""
    from tts_inference_tpu.config import SamplingConfig, StreamConfig
    from tts_inference_tpu.serving.app import parse_request

    defaults, sdef = SamplingConfig(), StreamConfig()
    _, _, s, sc, _ = parse_request(
        {"text": "hi", "force_speech": True,
         "first_chunk_lookahead": 0.5,          # the advisor's repro
         "frames_per_chunk": 0, "lookahead_frames": -3,
         "max_tokens": -5, "temperature": -1.0, "top_p": 7,
         "seed": 3.0, "repetition_penalty": 0},
        defaults, sdef,
    )
    assert isinstance(sc.first_chunk_lookahead, int)
    assert sc.first_chunk_lookahead == 0
    assert sc.frames_per_chunk >= 1
    assert sc.lookahead_frames >= 0
    assert s.max_tokens >= 1
    assert s.temperature >= 0.0 and 0.0 <= s.top_p <= 1.0
    assert isinstance(s.seed, int) and s.repetition_penalty > 0
    # None passthrough preserved
    _, _, _, sc2, _ = parse_request({"text": "x"}, defaults, sdef)
    assert sc2.first_chunk_lookahead == sdef.first_chunk_lookahead


def test_parse_request_fuzz():
    """Randomized junk on every wire field must either raise cleanly
    (endpoints catch and return an error message) or produce well-typed,
    clamped values — a malformed request must never smuggle a float or
    negative into a jit graph shape (the round-2 advisor's failure class:
    one bad request killing the whole admission wave)."""
    import random

    from tts_inference_tpu.config import SamplingConfig, StreamConfig
    from tts_inference_tpu.serving.app import parse_request

    defaults, sdef = SamplingConfig(), StreamConfig()
    junk = [None, -1, 0, 1.5, -3.7, 1e18, "abc", "", [], {}, True, "7",
            float("nan"), float("inf")]
    fields = ["temperature", "top_p", "repetition_penalty", "max_tokens",
              "seed", "frames_per_chunk", "lookahead_frames",
              "first_chunk_lookahead", "frame_protocol", "audio_only",
              "benchmark", "force_speech", "voice", "text"]
    rng = random.Random(0)
    raised = 0
    for _ in range(300):
        data = {f: rng.choice(junk) for f in rng.sample(fields, 5)}
        try:
            _, voice, s, sc, opts = parse_request(data, defaults, sdef)
        except (TypeError, ValueError, OverflowError):
            raised += 1     # endpoints catch these and answer with an error
            continue
        assert isinstance(voice, str)
        assert isinstance(s.max_tokens, int) and s.max_tokens >= 1
        assert s.temperature >= 0.0 and 0.0 <= s.top_p <= 1.0
        assert s.repetition_penalty > 0
        assert s.seed is None or isinstance(s.seed, int)
        assert isinstance(sc.frames_per_chunk, int) and sc.frames_per_chunk >= 1
        assert isinstance(sc.lookahead_frames, int) and sc.lookahead_frames >= 0
        assert sc.first_chunk_lookahead is None or (
            isinstance(sc.first_chunk_lookahead, int)
            and sc.first_chunk_lookahead >= 0)
        for v in opts.values():
            assert isinstance(v, bool)
    # the fuzzer must exercise BOTH outcomes
    assert 0 < raised < 300
