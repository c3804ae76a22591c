"""Launchable lockstep multi-host serving (VERDICT r3 #2).

End-to-end: two real `cli serve --coordinator` processes form a global
dp=2 × tp=2 mesh (2 processes × 2 virtual CPU devices, gloo TCP — the CI
stand-in for one-host-per-process TPU slices). Process 0 owns the WS/HTTP
API and mirrors every device-entering EngineCore call to process 1 over
the lockstep side channel (parallel/lockstep.py). A client generates
through process 0 and the audio must be BIT-IDENTICAL to single-process
serving — multi-host is a pure performance transform.

Fast-profile tests cover the handle-table/encoding mechanics; the
subprocess end-to-end is @slow.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQ = {
    "text": "lockstep serving check",
    "force_speech": True,
    "max_tokens": 64,
    "seed": 7,
    "audio_only": True,
}


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def wait_health(port, procs, timeout=480):
    deadline = time.time() + timeout
    while time.time() < deadline:
        for p in procs:
            if p.poll() is not None and p.returncode != 0:
                return False
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=2
            ) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(0.5)
    return False


def _generate_wav(port, timeout=180) -> bytes:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(REQ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.status == 200
        return r.read()


def _env():
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    # children size their own virtual device counts; drop the parent
    # conftest's 8-device pin
    env.pop("XLA_FLAGS", None)
    env.pop("TTS_TPU_TESTS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


# ---- unit: handle table + arg encoding ----------------------------------


def test_handle_table_roundtrip():
    import jax.numpy as jnp

    from tts_inference_tpu.parallel import lockstep as LS

    a_tab, b_tab = LS._HandleTable(), LS._HandleTable()
    out = (jnp.arange(4), {"x": jnp.ones(2), "y": 3})
    a_tab.register_outputs(out)
    # follower registers its own twin under the same ids
    twin = (jnp.arange(4), {"x": jnp.ones(2), "y": 3})
    b_tab.register_outputs(twin)

    args = (out[0], np.int32(5), [out[1]["x"], "s"])
    enc = LS._encode(a_tab, args)
    # device arrays became refs; host values passed through
    assert isinstance(enc[0], LS._Ref)
    assert isinstance(enc[2][0], LS._Ref)
    assert enc[1] == 5 and enc[2][1] == "s"
    import pickle

    dec = LS._decode(b_tab, pickle.loads(pickle.dumps(enc)))
    np.testing.assert_array_equal(np.asarray(dec[0]), np.arange(4))
    np.testing.assert_array_equal(np.asarray(dec[2][0]), np.ones(2))


def test_handle_table_window_eviction():
    import jax.numpy as jnp

    from tts_inference_tpu.parallel import lockstep as LS

    tab = LS._HandleTable(window=4)
    arrs = [jnp.full(2, i) for i in range(6)]
    for a in arrs:
        tab.register_outputs(a)
    assert tab.hid_for(arrs[0]) is None          # evicted
    assert tab.hid_for(arrs[5]) == 5
    np.testing.assert_array_equal(np.asarray(tab.lookup(5)), [5, 5])


def test_unregistered_array_falls_back_to_value():
    """A host-built operand (e.g. SamplingParams leaves) crosses the wire
    by value, not by ref."""
    import jax.numpy as jnp

    from tts_inference_tpu.parallel import lockstep as LS

    tab = LS._HandleTable()
    enc = LS._encode(tab, (jnp.full(3, 2.5),))
    # shipped as a _JnpVal marker (numpy payload) so the follower rebuilds
    # a jax array — pjit in_shardings reject raw numpy operands
    assert isinstance(enc[0], LS._JnpVal)
    assert isinstance(enc[0].val, np.ndarray)
    np.testing.assert_allclose(enc[0].val, 2.5)
    dec = LS._decode(LS._HandleTable(), enc)
    import jax

    assert isinstance(dec[0], jax.Array)


def test_repeated_operand_wire_value_is_memoized():
    """A repeated input operand (the same SamplingParams arrays every
    decode call) is fetched from device ONCE: the second encode returns
    the identical cached _JnpVal. Without this, every mirrored call paid
    one blocking device round-trip per operand array — measured +45 ms
    per launch over the tunnel against a 132 µs wire cost (PERF.md
    round-5 lockstep overhead)."""
    import jax.numpy as jnp

    from tts_inference_tpu.parallel import lockstep as LS

    tab = LS._HandleTable(window=2)
    a = jnp.full(3, 2.5)
    w1 = LS._encode(tab, (a,))[0]
    w2 = LS._encode(tab, (a,))[0]
    assert w1 is w2                       # memoized, no second fetch
    # a REGISTERED output still encodes as a _Ref, never by value
    tab.register_outputs((a,))
    assert isinstance(LS._encode(tab, (a,))[0], LS._Ref)
    # eviction: pushing past the window (2) drops the oldest cached value
    d = jnp.full(3, 7.0)   # a fresh unregistered operand
    w_d = LS._encode(tab, (d,))[0]
    b, c = jnp.zeros(2), jnp.ones(2)
    LS._encode(tab, (b,))
    LS._encode(tab, (c,))                 # window full -> d evicted
    w_d2 = LS._encode(tab, (d,))[0]
    assert w_d2 is not w_d                # re-fetched after eviction
    np.testing.assert_allclose(w_d2.val, 7.0)


def test_mirrored_core_replays_on_follower():
    """In-process mirror: a coordinator MirroredCore over a socketpair and
    a follower EngineCore replaying it produce identical tokens."""
    import threading

    from tts_inference_tpu import protocol
    from tts_inference_tpu.config import SamplingConfig, tiny_config
    from tts_inference_tpu.engine.engine import EngineCore
    from tts_inference_tpu.models import llama
    from tts_inference_tpu.ops import sampling as S
    from tts_inference_tpu.parallel import lockstep as LS

    import jax

    cfg = tiny_config()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg.model)
    core_a = EngineCore(params, cfg.model, cfg.engine,
                        eos_id=protocol.TOKEN_EOS, seed=0)
    core_b = EngineCore(params, cfg.model, cfg.engine,
                        eos_id=protocol.TOKEN_EOS, seed=0)

    sa, sb = socket.socketpair()
    mirrored = LS.MirroredCore(core_a, [sa])
    follower_toks = {}

    def follower():
        n = LS.follower_loop(core_b, sb)
        follower_toks["replayed"] = n

    th = threading.Thread(target=follower)
    th.start()

    sp = S.SamplingParams.from_config(SamplingConfig(greedy=True),
                                      core_a.batch)
    toks0, tok, act = mirrored.prefill_decode_launch(
        [[7, 8, 9], [10, 11]], [0, 1], sp,
        np.zeros(core_a.batch, np.int32), np.zeros(core_a.batch, bool),
        n=4,
    )
    toks1, tok, act = mirrored.decode_steps_launch(sp, tok, act)
    a = np.concatenate([np.asarray(toks0), np.asarray(toks1)], axis=1)
    mirrored.close()
    th.join(timeout=60)
    assert follower_toks["replayed"] == 2

    # replay by hand against a third identical core = ground truth
    core_c = EngineCore(params, cfg.model, cfg.engine,
                        eos_id=protocol.TOKEN_EOS, seed=0)
    t0, tk, ac = core_c.prefill_decode_launch(
        [[7, 8, 9], [10, 11]], [0, 1], sp,
        np.zeros(core_c.batch, np.int32), np.zeros(core_c.batch, bool),
        n=4,
    )
    t1, _, _ = core_c.decode_steps_launch(sp, tk, ac)
    b = np.concatenate([np.asarray(t0), np.asarray(t1)], axis=1)
    np.testing.assert_array_equal(a, b)
    # and the follower's core advanced identically: same KV length bounds
    np.testing.assert_array_equal(core_b._len_bounds, core_c._len_bounds)


# ---- failure semantics (VERDICT r4 #3) -----------------------------------


def test_mirrored_core_peer_lost_is_fatal_and_sticky():
    """A dead follower channel turns every mirrored call into an instant
    LockstepPeerLost — never a hang, never a retry against a dead mesh."""
    from tts_inference_tpu.parallel import lockstep as LS

    class StubCore:
        def reset_slots(self):
            return None

    sa, sb = socket.socketpair()
    sb.close()                           # the follower died
    m = LS.MirroredCore(StubCore(), [sa])
    with pytest.raises(LS.LockstepPeerLost):
        for _ in range(8):               # first send may land in the buffer
            m.reset_slots()
            time.sleep(0.02)
    assert m.peer_lost is not None
    t0 = time.perf_counter()
    with pytest.raises(LS.LockstepPeerLost):
        m.reset_slots()                  # sticky and instant
    assert time.perf_counter() - t0 < 1.0
    with pytest.raises(LS.LockstepPeerLost):
        m.lockstep_check()
    m.close()                            # no-op on a failed mirror
    sa.close()


def test_handshake_rejects_strangers_and_wrong_token(monkeypatch):
    """A port-scanner can't occupy a follower slot; a wrong-token follower
    fails fast; the real follower still gets in (ADVICE r4 medium)."""
    import threading

    from tts_inference_tpu.parallel import lockstep as LS

    monkeypatch.setenv("TTS_LOCKSTEP_TOKEN", "sesame")
    port = free_port()
    out = {}

    def coord():
        out["socks"] = LS.coordinator_channel(
            port, 1, timeout_s=60, bind="127.0.0.1")

    th = threading.Thread(target=coord, daemon=True)
    th.start()
    deadline = time.time() + 30
    stranger = None
    while time.time() < deadline:
        try:
            stranger = socket.create_connection(("127.0.0.1", port),
                                                timeout=1)
            break
        except OSError:
            time.sleep(0.05)
    assert stranger is not None
    stranger.sendall(b"GET / HTTP/1.1\r\n\r\n" + b"\x00" * 40)
    monkeypatch.setenv("TTS_LOCKSTEP_TOKEN", "wrong")
    with pytest.raises((RuntimeError, OSError)):
        LS.follower_channel("127.0.0.1", port, timeout_s=3)
    monkeypatch.setenv("TTS_LOCKSTEP_TOKEN", "sesame")
    f = LS.follower_channel("127.0.0.1", port, timeout_s=30)
    th.join(timeout=30)
    assert not th.is_alive() and len(out["socks"]) == 1
    stranger.close()
    f.close()
    for c in out["socks"]:
        c.close()


def test_scheduler_fatal_on_lockstep_loss():
    """LockstepPeerLost in the scheduler loop: every live request errors,
    new submits are rejected, run_forever exits, on_fatal fires — the
    reference's engine-core-dies-connections-hang lesson (res.md:69-77)
    inverted into clean failure."""
    from tts_inference_tpu.config import SamplingConfig, StreamConfig
    from tts_inference_tpu.engine.scheduler import Scheduler, TTSRequest
    from tts_inference_tpu.parallel import lockstep as LS
    from tts_inference_tpu.runtime import create_tiny_runtime

    rt = create_tiny_runtime(seed=0)
    sched = Scheduler(rt.engine.core.params, rt.config, rt.vocoder,
                      rt.tokenizer)

    def bad_step():
        raise LS.LockstepPeerLost("follower 1 gone")

    sched.step = bad_step
    req = TTSRequest(text="x", sampling=SamplingConfig(max_tokens=8),
                     stream_cfg=StreamConfig(), force_speech=True)
    sched.submit(req)
    fatal_seen = []
    sched.on_fatal = fatal_seen.append
    sched.run_forever()                  # returns (not loops) on fatal
    kind, payload = req.events.get(timeout=5)
    assert kind == "error" and "follower 1 gone" in payload
    assert sched.fatal is not None and fatal_seen
    req2 = TTSRequest(text="y", sampling=SamplingConfig(max_tokens=8),
                      stream_cfg=StreamConfig(), force_speech=True)
    sched.submit(req2)
    kind2, payload2 = req2.events.get(timeout=5)
    assert kind2 == "error" and "engine down" in payload2


# ---- end-to-end: 2 processes, WS/HTTP serving ---------------------------


@pytest.mark.slow
def test_lockstep_two_process_serving_matches_single(tmp_path):
    http_port, coord_port, ls_port = free_port(), free_port(), free_port()
    env = _env()

    def serve_cmd(pid):
        return [
            sys.executable, "-m", "tts_inference_tpu.cli", "serve",
            "--tiny", "--cpu", "--virtual-devices", "2", "--tp", "2",
            "--coordinator", f"127.0.0.1:{coord_port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--lockstep-port", str(ls_port),
            "--port", str(http_port),
        ]

    logs = [open(tmp_path / f"p{i}.log", "w") for i in range(2)]
    procs = [
        subprocess.Popen(serve_cmd(i), cwd=ROOT, env=env,
                         stdout=logs[i], stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        ok = wait_health(http_port, procs)
        if not ok:
            for i in range(2):
                logs[i].flush()
                print(open(tmp_path / f"p{i}.log").read()[-4000:])
        assert ok, "lockstep server never became healthy"
        wav_lockstep = _generate_wav(http_port)
        # a second request exercises steady-state (slot reuse) too
        wav_lockstep2 = _generate_wav(http_port)
        # token debug endpoints must refuse, not hang
        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/dump-tokens",
            data=json.dumps({"text": "x"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("dump-tokens should 503 under lockstep")
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()

    # single-process reference serve (no mesh)
    sp_port = free_port()
    log = open(tmp_path / "single.log", "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tts_inference_tpu.cli", "serve",
         "--tiny", "--cpu", "--port", str(sp_port)],
        cwd=ROOT, env=_env(), stdout=log, stderr=subprocess.STDOUT,
    )
    try:
        assert wait_health(sp_port, [proc]), "single server never healthy"
        wav_single = _generate_wav(sp_port)
        wav_single2 = _generate_wav(sp_port)
    finally:
        if proc.poll() is None:
            proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()

    assert wav_lockstep == wav_single, \
        "lockstep serving must be bit-identical to single-process"
    assert wav_lockstep2 == wav_single2


@pytest.mark.slow
def test_lockstep_follower_death_fails_clean(tmp_path):
    """Kill the follower mid-stream: the client must get a clean error
    (never a hang) and the coordinator must exit NONZERO on its own so a
    supervisor (deploy/launch.py --lockstep-processes) restarts the whole
    group (VERDICT r4 #3a)."""
    import threading

    http_port, coord_port, ls_port = free_port(), free_port(), free_port()
    env = _env()
    env["TTS_LOCKSTEP_WATCHDOG_S"] = "20"

    def serve_cmd(pid):
        return [
            sys.executable, "-m", "tts_inference_tpu.cli", "serve",
            "--tiny", "--cpu", "--virtual-devices", "2", "--tp", "2",
            "--coordinator", f"127.0.0.1:{coord_port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--lockstep-port", str(ls_port),
            "--port", str(http_port),
        ]

    logs = [open(tmp_path / f"kp{i}.log", "w") for i in range(2)]
    procs = [
        subprocess.Popen(serve_cmd(i), cwd=ROOT, env=env,
                         stdout=logs[i], stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        ok = wait_health(http_port, procs)
        if not ok:
            for i in range(2):
                logs[i].flush()
                print(open(tmp_path / f"kp{i}.log").read()[-4000:])
        assert ok, "lockstep server never became healthy"

        result: dict = {}

        def gen():
            long_req = dict(REQ, max_tokens=1024)
            try:
                r = urllib.request.Request(
                    f"http://127.0.0.1:{http_port}/generate",
                    data=json.dumps(long_req).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(r, timeout=300) as resp:
                    result["status"] = resp.status
                    resp.read()
            except Exception as e:  # noqa: BLE001 — any clean error is a pass
                result["error"] = repr(e)

        th = threading.Thread(target=gen, daemon=True)
        th.start()
        time.sleep(1.0)
        procs[1].kill()                 # the follower dies mid-stream
        th.join(timeout=300)
        assert not th.is_alive(), "client hung after follower death"
        if result.get("status") == 200:
            # the request won the race with the kill — the NEXT one must
            # error cleanly (and trips the fatal path)
            result.clear()
            gen()
        assert "error" in result or result.get("status") != 200, result

        # the coordinator declares the mesh dead and exits nonzero
        rc0 = procs[0].wait(timeout=300)
        assert rc0 not in (0, None), f"coordinator rc={rc0}"
    finally:
        for i, p in enumerate(procs):
            if p.poll() is None:
                p.kill()
            p.wait()
            logs[i].close()
