"""Multi-host (DCN) mesh: 2 real processes x 4 virtual CPU devices each.

SURVEY §5.8's second half: `jax.distributed` + a global mesh whose dp
axis crosses process boundaries (DCN) while tp stays within each
process's local devices (ICI). The children run the sharded train step
and a prefill digest (tests/multihost_driver.py); this test asserts

- both processes complete and agree bit-for-bit (lockstep SPMD), and
- the multi-process result matches a single-process 8-device run of the
  same computation — multi-host is a pure performance transform.

CI stand-in for multi-host TPU: gloo TCP collectives over localhost.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests import multihost_driver

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(ROOT, "tests", "multihost_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env() -> dict:
    env = dict(os.environ)
    # the children size their own virtual device count (4); drop the
    # parent conftest's 8-device flag and platform pins
    env.pop("XLA_FLAGS", None)
    env.pop("TTS_TPU_TESTS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    port = _free_port()
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, str(pid), "2", str(port), "4"],
            env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        outs.append(out)

    parsed = []
    for out in outs:
        m = re.search(
            r"MHOK pid=(\d+) nproc=(\d+) ndev=(\d+) local=(\d+) "
            r"loss=([-\d.]+) digest=([-\d.]+)", out)
        assert m, f"no MHOK line in child output:\n{out}"
        parsed.append(m)

    for m in parsed:
        assert m.group(2) == "2", "process_count != 2"
        assert m.group(3) == "8", "global device count != 8"
        assert m.group(4) == "4", "local device count != 4"
    # lockstep SPMD: both processes fetched identical replicated scalars
    assert parsed[0].group(5) == parsed[1].group(5)
    assert parsed[0].group(6) == parsed[1].group(6)

    # single-process reference on the parent's 8 virtual CPU devices,
    # same (dp=2, tp=4) topology
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    loss_ref, digest_ref = multihost_driver.compute(
        Mesh(devs, axis_names=("dp", "tp"))
    )
    loss_mh = float(parsed[0].group(5))
    digest_mh = float(parsed[0].group(6))
    np.testing.assert_allclose(loss_mh, loss_ref, rtol=2e-5)
    np.testing.assert_allclose(digest_mh, digest_ref, rtol=2e-5)


@pytest.mark.slow
def test_two_process_lockstep_serving_tick():
    """EngineCore over a process-spanning mesh with replicated token outs:
    every process fetches the full token matrix (lockstep SPMD serving) and
    the tokens match the unsharded single-process engine exactly."""
    port = _free_port()
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, str(pid), "2", str(port), "4",
             "serve"],
            env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    toks = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        m = re.search(r"MHSERVE pid=\d+ nproc=2 ndev=8 toks=\[([\d,]+)\]",
                      out)
        assert m, f"no MHSERVE line in child output:\n{out}"
        toks.append(np.array([int(t) for t in m.group(1).split(",")]))

    np.testing.assert_array_equal(toks[0], toks[1])
    want = multihost_driver.serve_tick(mesh=None).ravel()
    np.testing.assert_array_equal(toks[0], want)
