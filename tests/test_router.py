"""Replica router tests (deploy/router.py): least-loaded dispatch,
failover, WS passthrough, and metrics aggregation over tiny stub
replicas. The scale-out half of SURVEY.md §5.8 (reference analog: Modal
container fan-out, modal_benchmark.py:140-142)."""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import WSMsgType, web  # noqa: E402
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from deploy.router import Router, make_app  # noqa: E402


def stub_replica(name: str, delay_s: float = 0.0):
    """Tiny stand-in for a serving replica: /health, /metrics, /generate
    (tags responses with its name), /ws/tts echo."""
    hits = {"generate": 0, "ws": 0}

    async def health(request):
        return web.json_response({"status": "ok"})

    async def metrics(request):
        return web.json_response(
            {"scheduler": {"slots": 4, "active": hits["generate"],
                           "queued": 0}})

    async def generate(request):
        hits["generate"] += 1
        if delay_s:
            await asyncio.sleep(delay_s)
        body = await request.json()
        return web.json_response({"replica": name, "echo": body})

    async def ws(request):
        hits["ws"] += 1
        sock = web.WebSocketResponse()
        await sock.prepare(request)
        async for msg in sock:
            if msg.type == WSMsgType.TEXT:
                await sock.send_str(f"{name}:{msg.data}")
            elif msg.type == WSMsgType.BINARY:
                await sock.send_bytes(bytes(reversed(msg.data)))
        return sock

    app = web.Application()
    app.add_routes([web.get("/health", health),
                    web.get("/metrics", metrics),
                    web.post("/generate", generate),
                    web.get("/ws/tts", ws)])
    return app, hits


def run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


async def start_stack(replica_specs, **router_kw):
    """Start stub replica servers + a router client in one loop."""
    servers, hit_maps = [], []
    urls = []
    for spec in replica_specs:
        if spec is None:            # a dead replica: nothing listens here
            urls.append("http://127.0.0.1:1")
            hit_maps.append(None)
            continue
        app, hits = spec
        srv = TestServer(app)
        await srv.start_server()
        servers.append(srv)
        hit_maps.append(hits)
        urls.append(f"http://127.0.0.1:{srv.port}")
    router = Router(urls, **router_kw)
    client = TestClient(TestServer(make_app(router)))
    await client.start_server()

    async def teardown():
        await client.close()
        for s in servers:
            await s.close()

    return client, router, hit_maps, teardown


def test_http_dispatch_spreads_load():
    async def go():
        client, router, hits, teardown = await start_stack(
            [stub_replica("a", delay_s=0.15),
             stub_replica("b", delay_s=0.15)])
        try:
            reqs = [client.post("/generate", json={"i": i})
                    for i in range(4)]
            resps = await asyncio.gather(*reqs)
            served = []
            for r in resps:
                assert r.status == 200
                served.append((await r.json())["replica"])
            # concurrent requests with per-request inflight tracking must
            # land on BOTH replicas (least-loaded, not sticky-first)
            assert set(served) == {"a", "b"}, served
            assert hits[0]["generate"] == 2 and hits[1]["generate"] == 2
        finally:
            await teardown()

    run(go())


def test_failover_and_health():
    async def go():
        client, router, hits, teardown = await start_stack(
            [None, stub_replica("live")], cooldown_s=30.0)
        try:
            r = await client.post("/generate", json={"x": 1})
            assert r.status == 200
            assert (await r.json())["replica"] == "live"
            # the dead replica is now cooling down; health stays green
            h = await client.get("/health")
            assert h.status == 200
            body = await h.json()
            ups = {e["base"].split(":")[-1]: e["up"]
                   for e in body["replicas"]}
            assert list(body["replicas"])[0]["up"] is False
            assert body["status"] == "ok"
            # subsequent requests skip the dead one entirely
            r2 = await client.post("/generate", json={"x": 2})
            assert (await r2.json())["replica"] == "live"
            assert hits[1]["generate"] == 2
        finally:
            await teardown()

    run(go())


def test_all_replicas_down_returns_503():
    async def go():
        client, router, hits, teardown = await start_stack([None, None])
        try:
            r = await client.post("/generate", json={})
            assert r.status == 503
            h = await client.get("/health")
            assert h.status == 503
        finally:
            await teardown()

    run(go())


def test_ws_passthrough_text_and_binary():
    async def go():
        client, router, hits, teardown = await start_stack(
            [stub_replica("w")])
        try:
            ws = await client.ws_connect("/ws/tts")
            await ws.send_str("hello")
            msg = await ws.receive(timeout=10)
            assert msg.type == WSMsgType.TEXT and msg.data == "w:hello"
            await ws.send_bytes(b"\x01\x02\x03")
            msg = await ws.receive(timeout=10)
            assert msg.type == WSMsgType.BINARY
            assert msg.data == b"\x03\x02\x01"
            await ws.close()
            assert hits[0]["ws"] == 1
        finally:
            await teardown()

    run(go())


def test_ws_failover_to_live_replica():
    async def go():
        client, router, hits, teardown = await start_stack(
            [None, stub_replica("w2")], cooldown_s=30.0)
        try:
            ws = await client.ws_connect("/ws/tts")
            await ws.send_str("x")
            msg = await ws.receive(timeout=10)
            assert msg.data == "w2:x"
            await ws.close()
        finally:
            await teardown()

    run(go())


def test_metrics_aggregation():
    async def go():
        client, router, hits, teardown = await start_stack(
            [stub_replica("a"), stub_replica("b")])
        try:
            await client.post("/generate", json={})
            m = await client.get("/metrics")
            body = await m.json()
            agg = body["aggregate"]
            assert agg["replicas_up"] == 2
            assert agg["replicas_total"] == 2
            assert agg["slots"] == 8          # 4 per stub replica
            assert len(body["per_replica"]) == 2
            assert all("metrics" in e for e in body["per_replica"])
        finally:
            await teardown()

    run(go())
