"""Harmonic-oscillator ODE (examples/spring.jl).

``dx/dt = v, dv/dt = −γ²x`` with γ = √(k/m); defaults k=2, m=1, x₀=0.1,
v₀=0, t ∈ [0, 40] (examples/spring.jl:14-40).  Used to compare the stability
of the three implicit steppers over Δt ∈ {0.01 … 10}
(examples/spring.jl:44-88).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Params", "default_config", "rhs", "rhs_df", "initial_condition",
           "exact_solution"]


class Params(NamedTuple):
    gamma: float


def default_config(k: float = 2.0, m: float = 1.0) -> Params:
    return Params(gamma=math.sqrt(k / m))


def initial_condition(x0: float = 0.1, v0: float = 0.0, dtype=None):
    return jnp.array([x0, v0], dtype=dtype)


def rhs(u, p: Params, t=None):
    """f!(du, u, (γ,), t) (examples/spring.jl:14-18)."""
    return jnp.stack([u[1], -(p.gamma * p.gamma) * u[0]])


def rhs_df(u, p: Params, t=None):
    """df32 RHS (``u`` a DF pair): −γ² enters as a split constant; the
    component shuffle is a pure placement, exact per word."""
    from .. import df32 as dd

    ax = dd.scale_const(dd.df_map(lambda w: w[0:1], u),
                        -float(p.gamma) * float(p.gamma))
    v = dd.df_map(lambda w: w[1:2], u)
    return dd.DF(jnp.concatenate([v.hi, ax.hi]),
                 jnp.concatenate([v.lo, ax.lo]))


def exact_solution(t, p: Params, x0: float = 0.1, v0: float = 0.0):
    """x(t) = x₀cos(γt) + (v₀/γ)sin(γt) — for energy/amplitude checks."""
    g = p.gamma
    return x0 * jnp.cos(g * t) + (v0 / g) * jnp.sin(g * t)
