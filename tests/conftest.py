"""Test env: force JAX onto a virtual 8-device CPU mesh before jax imports.

Multi-chip hardware is unavailable in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4.7 — the reference
has no mocked distributed backend; this is ours).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
