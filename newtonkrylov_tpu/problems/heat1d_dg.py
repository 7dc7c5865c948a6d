"""1-D heat equation via DG / upwind operator composition
(examples/heat_1D_DG.jl).

``du = D1m @ (D1p @ u)`` where (D1m, D1p) are either a periodic Legendre-DG
pair (``legendre_derivative_operator`` + ``couple_discontinuously``,
examples/heat_1D_DG.jl:20-25) or periodic upwind finite-difference operators
(examples/heat_1D_DG.jl:134-141).  Demonstrates AD-through-library-operators:
the Jacobian operator differentiates straight through the matrices.

Defaults mirror the reference: DG with polydeg 3 × 40 elements on [0, 1];
upwind with 120 nodes, accuracy order 3; u₀ = sin(πx).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.sbp import (
    UniformPeriodicMesh1D,
    couple_discontinuously,
    legendre_derivative_operator,
    periodic_upwind_operators,
)

__all__ = ["Params", "dg_config", "upwind_config", "rhs", "initial_condition"]


class Params(NamedTuple):
    D1m: jnp.ndarray
    D1p: jnp.ndarray
    x: jnp.ndarray


def dg_config(polydeg: int = 3, elements: int = 40, xmin: float = 0.0, xmax: float = 1.0) -> Params:
    """Legendre-DG pair coupled with minus/plus upwind fluxes
    (examples/heat_1D_DG.jl:17-25)."""
    local_op = legendre_derivative_operator(polydeg + 1)
    mesh = UniformPeriodicMesh1D(xmin, xmax, elements)
    x, D1m = couple_discontinuously(local_op, mesh, "minus")
    _, D1p = couple_discontinuously(local_op, mesh, "plus")
    return Params(D1m=D1m, D1p=D1p, x=x)


def upwind_config(nnodes: int = 120, accuracy_order: int = 3, xmin: float = 0.0, xmax: float = 1.0) -> Params:
    """Periodic upwind FD pair (examples/heat_1D_DG.jl:134-141)."""
    dx = (xmax - xmin) / nnodes
    Dm, Dp = periodic_upwind_operators(nnodes, dx, accuracy_order)
    x = xmin + dx * jnp.arange(nnodes)
    return Params(D1m=Dm, D1p=Dp, x=x)


def initial_condition(p: Params):
    """f(x) = sin(πx) (examples/heat_1D_DG.jl:39)."""
    return jnp.sin(jnp.pi * p.x)


def rhs(u, p: Params, t=None):
    """du = D1m @ (D1p @ u) (examples/heat_1D_DG.jl:32-36)."""
    return p.D1m @ (p.D1p @ u)
