"""Checkpoint / resume for long time marches.

The reference has no checkpointing (SURVEY.md §5): state history lives only
in user callbacks.  Long production marches need durable snapshots of
``(u, uₙ, t, step, stats)``; this module provides a minimal, dependency-light
store (NumPy ``.npz`` of the flattened pytree + JSON-free metadata) with an
orbax-compatible layout question deferred — the snapshot is a plain pytree
so orbax users can swap the backend trivially.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional

import jax
import numpy as np

__all__ = ["MarchCheckpoint", "save_checkpoint", "load_checkpoint", "latest_checkpoint"]


class MarchCheckpoint(NamedTuple):
    u: Any            # current state pytree
    t: float          # simulation time
    step: int         # completed steps
    extra: dict       # user metadata (dt, stats, ...)


def save_checkpoint(path: str, ckpt: MarchCheckpoint) -> str:
    """Write a snapshot; returns the final filename (atomic rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree.flatten(ckpt.u)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["_t"] = np.asarray(ckpt.t)
    payload["_step"] = np.asarray(ckpt.step)
    payload["_treedef"] = np.asarray(str(treedef))
    for k, v in ckpt.extra.items():
        payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    final = path if path.endswith(".npz") else path + ".npz"
    os.replace(tmp, final)
    return final


def load_checkpoint(path: str, u_template: Any) -> MarchCheckpoint:
    """Restore a snapshot; ``u_template`` supplies the pytree structure."""
    with np.load(path, allow_pickle=False) as z:
        leaves_t, treedef = jax.tree.flatten(u_template)
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_t))]
        u = jax.tree.unflatten(treedef, [jax.numpy.asarray(l) for l in leaves])
        extra = {
            k[len("extra_"):]: z[k].item() if z[k].ndim == 0 else z[k]
            for k in z.files
            if k.startswith("extra_")
        }
        return MarchCheckpoint(
            u=u, t=float(z["_t"]), step=int(z["_step"]), extra=extra
        )


def latest_checkpoint(directory: str, prefix: str = "march_") -> Optional[str]:
    """Most recent checkpoint file in a directory (by step number in name)."""
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory) if f.startswith(prefix) and f.endswith(".npz")]
    if not cands:
        return None

    def step_of(f):
        try:
            return int(f[len(prefix):].split(".")[0])
        except ValueError:
            return -1

    return os.path.join(directory, max(cands, key=step_of))
