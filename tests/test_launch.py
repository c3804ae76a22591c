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
