"""Multi-host (DCN) mesh support — the second half of SURVEY §5.8.

The reference's only multi-machine pattern is Modal container fan-out
(`modal_benchmark.py:140-142`); it has no first-party distributed code.
TPU-natively, scale-out has two tiers:

- **Independent replicas over DCN** (no shared state): shipped as
  `deploy/launch.py --replicas N` — one process + one mesh per replica
  behind a least-loaded front router.
- **One logical engine spanning hosts** (this module):
  `jax.distributed.initialize` forms the cluster, and a *global* mesh is
  laid out so the inner `tp` axis never leaves a host's local chips (ICI)
  while the outer `dp` axis crosses process boundaries (DCN). XLA then
  routes tensor-parallel collectives (psum on row-parallel matmuls) over
  ICI and batch-axis traffic over DCN — the scaling-book recipe: keep the
  chatty axis on the fast fabric.

Every jitted computation must be entered by *all* processes in lockstep
(SPMD). For serving that means either dp-pure sharding with per-host
request feeds, or a lockstep scheduler where host 0 owns the API and
token outputs are replicated (see tests/test_multihost.py for the
executable contract).

Works on real multi-host TPU slices and, for CI, on N CPU processes with
gloo collectives over TCP (`tests/test_multihost.py`: 2 processes × 4
virtual CPU devices = one global dp=2(DCN) × tp=4(ICI) mesh running the
sharded train step and model forward).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    *,
    platform: Optional[str] = None,
    local_cpu_devices: Optional[int] = None,
    timeout_s: int = 120,
) -> None:
    """Join (or form) a jax.distributed cluster.

    Must run before any JAX computation touches a backend. On
    ``platform="cpu"`` this also selects gloo TCP collectives and
    (optionally) a virtual local device count — the CI configuration that
    stands in for one-host-per-process TPU slices.

    ``platform`` handling mirrors tests/conftest.py: this environment's
    sitecustomize force-registers a TPU tunnel backend regardless of
    JAX_PLATFORMS, so the jax *config* must be updated after import — the
    only override that sticks.
    """
    if platform == "cpu" and local_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count="
                f"{int(local_cpu_devices)}"
            ).strip()
    import jax

    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
        initialization_timeout=int(timeout_s),
    )


def make_global_mesh(tp: Optional[int] = None):
    """(dp, tp) mesh over ALL processes' devices, tp confined to one host.

    ``jax.devices()`` orders devices process-major, so reshaping the flat
    list to (dp, tp) with ``tp <= local_device_count`` keeps every tp row
    inside one process: tensor-parallel collectives ride ICI, only the dp
    axis (batch / gradient reductions) crosses DCN.

    Default tp = the local device count (whole host per model shard).
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_local = len(jax.local_devices())
    tp = int(tp) if tp else n_local
    if tp > n_local:
        raise ValueError(
            f"tp={tp} exceeds local device count {n_local}: a tp group "
            "would span hosts and its collectives would ride DCN"
        )
    if n_local % tp:
        raise ValueError(f"tp={tp} does not divide local count {n_local}")
    if len(devices) % tp:
        raise ValueError(f"tp={tp} does not divide global {len(devices)}")
    dp = len(devices) // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    return process_index() == 0
