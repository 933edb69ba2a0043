"""Checkpoint / resume for optimization runs.

The reference has no checkpointing (SURVEY.md §5 — terminal-state artifacts
only); the functional train-step design makes it trivial here: the complete
run state (parameters, optimizer state, PRNG key, step counter) is one pytree.
Uses orbax-checkpoint when available, with a numpy ``.npz`` fallback so the
capability never disappears with the dependency.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_checkpoint(directory: str, state: Any, step: int) -> str:
    """Save a pytree ``state`` under ``directory/step_<N>``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ocp = _orbax()
    if ocp is not None:
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, state, force=True)
        return path
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "leaves.npz"),
             *[np.asarray(leaf) for leaf in leaves])
    with open(os.path.join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       example_state: Any = None) -> Any:
    """Restore the pytree saved by :func:`save_checkpoint` (latest step if
    ``step`` is None).  ``example_state`` restores exact pytree structure
    and dtypes with orbax."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ocp = _orbax()
    if ocp is not None and not os.path.exists(
            os.path.join(path, "treedef.pkl")):
        checkpointer = ocp.PyTreeCheckpointer()
        if example_state is not None:
            return checkpointer.restore(path, item=example_state)
        return checkpointer.restore(path)
    with open(os.path.join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    data = np.load(os.path.join(path, "leaves.npz"))
    leaves = [data[k] for k in sorted(data.files,
                                      key=lambda s: int(s.split("_")[1]))]
    return jax.tree.unflatten(treedef, leaves)
