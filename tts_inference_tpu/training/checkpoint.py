"""Checkpoint save/restore (orbax) — the framework's artifact layer.

The reference's "checkpointing" is Modal-volume artifact caching plus HF
Trainer save_steps (SURVEY.md §5.4). Here: orbax for params/adapters/opt
state with step retention, plus the persistent XLA compile cache
(runtime.enable_compilation_cache) as the compiled-engine artifact.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_params(path: str, params: Dict, metadata: Optional[dict] = None) -> None:
    """Save a params pytree (+ JSON metadata sidecar)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(os.path.join(path, "params"), params, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_params(path: str, like: Optional[Dict] = None) -> Tuple[Dict, dict]:
    """Restore a params pytree (optionally with a structure/dtype template)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    target = os.path.join(path, "params")
    params = ckptr.restore(target, like) if like is not None else \
        ckptr.restore(target)
    meta_path = os.path.join(path, "metadata.json")
    meta: dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta


class CheckpointManager:
    """Step-indexed checkpoints with retention (HF save_steps analog)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def restore_latest(self, like: Optional[Any] = None) -> Tuple[int, Any]:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoints")
        if like is not None:
            tree = self._mgr.restore(
                step, args=ocp.args.StandardRestore(like)
            )
        else:
            tree = self._mgr.restore(step)
        return step, tree

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
