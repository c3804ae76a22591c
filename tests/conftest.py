"""Test env: force JAX onto a virtual 8-device CPU mesh before jax imports.

Multi-chip hardware is unavailable in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.7 — the reference
has no mocked distributed backend; this is ours).
"""

import os

# Force-override: the host environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel) and its sitecustomize.py re-registers the axon backend with
# jax_platforms="axon,cpu" regardless of the env var — so we must override
# the jax config itself, not just the environment.
_ON_TPU = os.environ.get("TTS_TPU_TESTS") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Suite diet (VERDICT r3 #6): the slow tail (multihost 2-process runs, the
# soak, long-audio, sweep-class benchmarks) is @pytest.mark.slow and skipped
# by default — `pytest tests/ -q` is the fast iteration profile; the full
# CI profile is `pytest tests/ -q --runslow`.
#
# Bench hygiene (PERF.md measurement trap): NEVER run this suite while an
# engine-level TPU benchmark shares the host — device dispatch is host-fed,
# and a contended host inflates every "device" phase. Fixed-window step
# chains (tools/step_bench.py) are the only load-tolerant bench surface.


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run @pytest.mark.slow tests (full CI "
                          "profile; default run skips them)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow for the full profile")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
