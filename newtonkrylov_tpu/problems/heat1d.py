"""1-D heat equation ``uₜ = a·uₓₓ`` with Dirichlet or periodic BCs
(examples/heat_1D.jl).

The reference enforces BCs by mutating the state inside the RHS
(``bc!(u); du[1]=0; du[end]=0``, examples/heat_1D.jl:16-18,34-42), which
makes the boundary rows of the step Jacobian identity-like — the structure
studied in its rank/condition analysis (examples/heat_1D.jl:55-93).  The
functional equivalent: clamp a *copy* of u, compute the interior stencil,
zero the boundary rows of du.  Initial conditions must be pre-clamped
(:func:`clamp_bc`) since a pure residual cannot mutate the solver's state.

Default scenario (examples/heat_1D.jl:99-121): L=1, M=100 interior points,
a=0.2, Δt=0.1 to t=3, u₀ = f(x) = 4x(1−x), implicit Euler/midpoint/trapezoid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Params", "default_config", "rhs", "rhs_df", "clamp_bc",
           "initial_condition", "grid"]


class Params(NamedTuple):
    a: float
    dx: float
    bc: str  # "dirichlet" | "periodic"


def default_config(m: int = 100, a: float = 0.2, bc: str = "dirichlet") -> Params:
    return Params(a=a, dx=1.0 / (m + 1), bc=bc)


def grid(m: int = 100, L: float = 1.0, dtype=None):
    """xs = 0:Δx:L inclusive (examples/heat_1D.jl:100-101): m+2 points."""
    dx = 1.0 / (m + 1)
    return jnp.arange(0.0, L + dx / 2, dx, dtype=dtype)


def initial_condition(x):
    """f(x) = 4x(1−x) (examples/heat_1D.jl:46)."""
    return 4.0 * x * (1.0 - x)


def _apply_bc(u, bc: str):
    if bc == "dirichlet":
        # bc!: u[1] = 0; u[end] = 0 (examples/heat_1D.jl:34-37)
        return u.at[0].set(0.0).at[-1].set(0.0)
    elif bc == "periodic":
        # periodic_bc!: u[1] = u[end-1]; u[end] = u[2] (examples/heat_1D.jl:39-42)
        return u.at[0].set(u[-2]).at[-1].set(u[1])
    raise ValueError(f"unknown bc {bc!r}")


def clamp_bc(u0, p: Params):
    """Pre-apply the BC to an initial state (the reference's in-residual
    mutation did this to the caller's array as a side effect)."""
    return _apply_bc(u0, p.bc)


def rhs(u, p: Params, t=None):
    """du = a·uₓₓ on the interior, du = 0 at both boundary rows
    (examples/heat_1D.jl:14-27)."""
    ub = _apply_bc(u, p.bc)
    du = jnp.zeros_like(u)
    interior = p.a * (ub[2:] - 2.0 * ub[1:-1] + ub[:-2]) / (p.dx * p.dx)
    return du.at[1:-1].set(interior)


def rhs_df(u, p: Params, t=None):
    """df32 RHS (``u`` a DF pair): the BC clamp is a pure placement (exact
    per word), the second difference resolves in exact two-sum chains, and
    a/Δx² enters as a split constant.  Pair with
    :func:`~newtonkrylov_tpu.timestep.implicit_euler_df` for 1e-8
    acceptance marches on TPU (tests/test_df32_problems.py)."""
    from .. import df32 as dd

    ub = dd.df_map(lambda w: _apply_bc(w, p.bc), u)
    s = dd.add(dd.df_map(lambda w: w[2:], ub), dd.df_map(lambda w: w[:-2], ub))
    s = dd.add(s, dd.scale_pow2(dd.df_map(lambda w: w[1:-1], ub), -2.0))
    interior = dd.scale_const(s, float(p.a) / (float(p.dx) * float(p.dx)))

    def asm(word):
        return jnp.zeros(u.hi.shape, word.dtype).at[1:-1].set(word)

    return dd.DF(asm(interior.hi), asm(interior.lo))
