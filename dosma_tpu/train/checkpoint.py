"""Training checkpoint/resume via Orbax.

The reference's checkpointing is scan-state pickles (SURVEY.md §5); the
training subsystem adds standard accelerator-side checkpointing: params +
optimizer state saved with ``orbax.checkpoint``, restored onto the current
mesh shardings.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, params: Any, opt_state: Any = None):
    """Save params (+ optional optimizer state) under ``ckpt_dir/step_N``."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    _checkpointer().save(path, payload, force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None, target: Any = None):
    """Restore the checkpoint payload dict ({"params", "opt_state"?}).

    ``target``: an example payload pytree whose array SHARDINGS the restore
    reproduces (pass the trainer's live ``{"params": ..., "opt_state": ...}``
    to land parameters directly on the mesh). Without it, arrays restore
    host-side replicated and the next jitted step has to re-lay them out.
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    if target is None:
        return _checkpointer().restore(path)

    import jax
    import orbax.checkpoint as ocp

    def _as_restore_args(x):
        if hasattr(x, "sharding"):
            return ocp.ArrayRestoreArgs(sharding=x.sharding, dtype=x.dtype)
        return ocp.RestoreArgs()

    restore_args = jax.tree_util.tree_map(_as_restore_args, target)
    return _checkpointer().restore(path, restore_args=restore_args)
