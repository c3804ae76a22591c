"""Lifecycle launcher tests (deploy/launch.py) — the warm-container
pattern: build → serve → health-watch → restart-on-crash → drain."""

import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import pytest


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def wait_health(port, timeout=240):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=2
            ) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(0.5)
    return False


@pytest.mark.slow
def test_launcher_serves_and_drains(tmp_path):
    port = free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "deploy.launch", "--port", str(port),
         "--skip-build", "--health-interval", "1",
         "--", "--tiny", "--cpu", "--no-warmup"],
        cwd="/root/repo", env=env,
        stdout=open(tmp_path / "launch.log", "w"), stderr=subprocess.STDOUT,
    )
    try:
        assert wait_health(port), "server never became healthy"
        # generate through the supervised server
        import json

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({
                "text": "launcher check", "force_speech": True,
                "max_tokens": 40, "audio_only": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                assert r.headers["Content-Type"] == "audio/wav"
        except urllib.error.HTTPError as e:
            raise AssertionError(
                f"server error {e.code}: {e.read()[:300]!r}"
            ) from e
        # graceful drain on SIGTERM
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_launcher_replicas_behind_router(tmp_path):
    """--replicas 2: two tiny servers + front router; generate through the
    router, failover after a replica is killed, supervisor restarts it."""
    port = free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "deploy.launch", "--port", str(port),
         "--replicas", "2", "--skip-build", "--health-interval", "1",
         "--", "--tiny", "--cpu", "--no-warmup"],
        cwd="/root/repo", env=env,
        stdout=open(tmp_path / "launch.log", "w"), stderr=subprocess.STDOUT,
    )
    p1, p2 = port + 1, port + 2
    try:
        assert wait_health(p1) and wait_health(p2), "replicas not healthy"
        assert wait_health(port), "router never became healthy"

        import json

        def gen(tag):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({
                    "text": f"replica check {tag}", "force_speech": True,
                    "max_tokens": 30, "audio_only": True,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=180) as r:
                assert r.status == 200
                assert r.headers["Content-Type"] == "audio/wav"

        gen("a")
        # kill replica 1 (child whose cmdline carries --port p1)
        out = subprocess.run(["pgrep", "-P", str(proc.pid)],
                             capture_output=True, text=True)
        victim = None
        for pid in out.stdout.split():
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = f.read().split(b"\0")
            if str(p1).encode() in argv and b"serve" in argv:
                victim = int(pid)
        assert victim, "replica 1 pid not found"
        os.kill(victim, signal.SIGKILL)
        # router fails over to replica 2 immediately
        gen("b")
        # supervisor brings replica 1 back
        assert wait_health(p1, timeout=240), "replica 1 not restarted"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=90) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_launcher_restarts_crashed_server(tmp_path):
    port = free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "deploy.launch", "--port", str(port),
         "--skip-build", "--health-interval", "1", "--max-restarts", "3",
         "--", "--tiny", "--cpu", "--no-warmup"],
        cwd="/root/repo", env=env,
        stdout=open(tmp_path / "launch.log", "w"), stderr=subprocess.STDOUT,
    )
    try:
        assert wait_health(port), "server never became healthy"
        # find and kill the child server process (the launcher's child)
        out = subprocess.run(
            ["pgrep", "-P", str(proc.pid)], capture_output=True, text=True
        )
        child_pid = int(out.stdout.split()[0])
        os.kill(child_pid, signal.SIGKILL)
        # launcher must bring a new server back up on the same port
        time.sleep(2)
        assert wait_health(port, timeout=240), "server was not restarted"
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
