"""2-D Bratu problem ``Δu + λeᵘ = 0`` on the unit square, zero Dirichlet BCs.

The BASELINE flagship (BASELINE.json: "2D Bratu (bratu.jl) Δu + λe^u = 0,
Eisenstat-Walker inexact Newton") — the 2-D extension of the reference's 1-D
Bratu (examples/bratu.jl) on the halo-style grid layout of
examples/heat_2D.jl.  State is the (n, n) *interior* as a 2-D array (TPU
lane/sublane friendly); ghost values are materialized functionally by
``jnp.pad`` or, in the sharded path, by halo exchange.

For λ below the critical value λ* ≈ 6.808 two solutions exist; Newton from
u₀ = 0 or the sin-bump below converges to the lower branch.  No closed form
exists in 2-D; correctness is asserted via ‖F(u*)‖ and mesh-convergence.

The Δx²-scaled residual is the default on TPU (f32-safe; identical roots and
Newton iteration counts — see problems/bratu1d.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.stencil import laplacian_2d, pad_dirichlet

__all__ = ["Params", "default_config", "residual", "residual_scaled", "initial_guess", "grid"]

N_DEFAULT = 256
LAMBDA_DEFAULT = 6.0


class Params(NamedTuple):
    dx: float
    lam: float


def default_config(n: int = N_DEFAULT, lam: float = LAMBDA_DEFAULT) -> Params:
    return Params(dx=1.0 / (n + 1), lam=lam)


def grid(n: int = N_DEFAULT, dtype=None):
    dx = 1.0 / (n + 1)
    x = jnp.linspace(dx, 1.0 - dx, n, dtype=dtype)
    return jnp.meshgrid(x, x, indexing="ij")


def initial_guess(n: int = N_DEFAULT, dtype=None):
    """sin-bump u₀ = sin(πx)sin(πy) (2-D analogue of examples/bratu.jl:46)."""
    X, Y = grid(n, dtype)
    return jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)


def residual(u, p: Params):
    """Δu + λeᵘ over the interior, zero Dirichlet ghosts."""
    return laplacian_2d(pad_dirichlet(u), p.dx, p.dx) + p.lam * jnp.exp(u)


def residual_scaled(u, p: Params):
    """Δx²-scaled form: (sum of neighbors − 4u) + Δx²λeᵘ — f32/TPU-safe."""
    up = pad_dirichlet(u)
    stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    return stencil + (p.dx * p.dx) * p.lam * jnp.exp(u)
