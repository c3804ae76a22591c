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
