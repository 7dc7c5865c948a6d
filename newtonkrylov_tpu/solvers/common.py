"""Shared solver plumbing: results, tolerances, operator adapters.

The reference delegates its entire linear-solve layer to Krylov.jl
(``src/Ariadne.jl:317-340``): a workspace is built once per Newton solve and
``krylov_solve!(workspace, J, b; rtol, M, N, ...)`` runs per outer iteration.
In a TPU-native functional design there is no mutable workspace — solvers are
pure jittable functions returning a :class:`KrylovResult`; XLA's buffer
assignment plays the role of workspace reuse.

Termination matches Krylov.jl's convention: stop when
``‖r_k‖ ≤ atol + rtol·‖r₀‖`` with defaults ``atol = rtol = √eps(dtype)``
(overridden per Newton iteration with ``rtol = η`` by the forcing logic,
``src/Ariadne.jl:330-333``).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

__all__ = ["KrylovResult", "default_tols", "as_operator"]


class KrylovResult(NamedTuple):
    """Result of a linear solve.

    Mirrors the fields the reference consumes from Krylov.jl:
    ``workspace.x`` (src/Ariadne.jl:340) and ``workspace.stats.niter``
    (src/Ariadne.jl:367), plus convergence/breakdown flags.
    """

    x: Any
    niter: jnp.ndarray          # number of operator applications / inner steps
    residual: jnp.ndarray       # final (estimated) residual norm
    converged: jnp.ndarray      # bool: met atol + rtol*‖r0‖
    breakdown: jnp.ndarray      # bool: happy/serious breakdown encountered


def default_tols(dtype, atol=None, rtol=None):
    """Krylov.jl-compatible defaults: atol = rtol = √eps(dtype)."""
    eps = float(jnp.finfo(dtype).eps)
    sq = eps ** 0.5
    return (sq if atol is None else atol), (sq if rtol is None else rtol)


def as_operator(A) -> Callable:
    """Accept either a callable v↦Av or an object with .mv()."""
    if callable(A):
        return A
    if hasattr(A, "mv"):
        return A.mv
    raise TypeError(f"not a linear operator: {A!r}")
