"""Ahead-of-time export of solves for serving.

Production deployments serve compiled artifacts, not Python: this wraps
``jax.export`` so a configured solve (or whole time march) can be serialized
to a portable StableHLO blob and executed later — in a different process,
a C++ runtime via the PJRT C API, or a serving container without the
framework installed.  The entire Newton–Krylov loop is inside the exported
computation (one XLA program — the reason ``newton_krylov_jit`` exists).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_solver", "save_exported", "load_exported"]


def export_solver(fn: Callable, example_args: Sequence[Any]):
    """AOT-export a jitted solve: returns a ``jax.export.Exported``.

    ``fn`` must be jit-wrapped (e.g. ``jax.jit(lambda u0:
    newton_krylov_jit(F, u0, p, ...)[0])``); ``example_args`` fix the input
    shapes/dtypes.
    """
    shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tuple(example_args)
    )
    return jexport.export(fn)(*shapes)


def save_exported(exported, path: str) -> str:
    """Serialize an Exported to disk; returns the path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Load a serialized solve; call it via ``.call(*args)``."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
