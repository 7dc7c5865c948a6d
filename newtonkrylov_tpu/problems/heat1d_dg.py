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

__all__ = ["Params", "dg_config", "upwind_config", "rhs", "rhs_df",
           "initial_condition"]


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


def rhs_df(u, p: Params, t=None):
    """du in df32 double-float arithmetic (``u`` a DF pair): the SBP
    operator composition as two double-word matvecs
    (:func:`~newtonkrylov_tpu.df32.df_matvec` — exact hi×hi products +
    compensated tree sums).  Pair with
    :func:`~newtonkrylov_tpu.timestep.implicit_euler_df` so DG/upwind heat
    marches reach a ≤1e-8 acceptance residual with no emulated f64 in the
    loop (tests/test_df32_problems.py pins it against the f64 oracle).
    Operator splits (``df_from_f64``) are loop-invariant — XLA hoists them.
    """
    from .. import df32 as dd

    Dm = dd.df_from_f64(p.D1m)
    Dp = dd.df_from_f64(p.D1p)
    return dd.df_matvec(Dm, dd.df_matvec(Dp, u))
