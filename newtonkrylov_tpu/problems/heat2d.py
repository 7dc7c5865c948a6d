"""2-D diffusion ``uₜ = a·Δu`` on the halo grid layout (examples/heat_2D.jl).

The reference stores a (N+2)×(M+2) ``HaloVector`` with a ghost ring and
presents the N×M interior to the solver (examples/halovector.jl:3-45); BC
functions fill the ghosts in place (examples/heat_2D.jl:15-38).  The
functional TPU design stores only the interior and materializes ghosts with
``jnp.pad`` (zero or wrap) — reductions therefore run over exactly the
interior, fixing the reference's off-by-one that includes the high ghost
row/col in dots/norms (examples/halovector.jl:56-61; SURVEY.md §5).

Default scenario (examples/heat_2D.jl:64-96): a = 0.01, N = M = 40,
Δx = Δy = 1/(N+1), Δt = Δx²Δy²/(2a(Δx²+Δy²)), u₀ = sin(πx)sin(πy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.stencil import laplacian_2d, pad_dirichlet, pad_periodic

__all__ = [
    "Params", "default_config", "rhs", "rhs_df", "rhs_df_padded",
    "initial_condition", "grid", "stable_dt",
]


class Params(NamedTuple):
    a: float
    dx: float
    dy: float
    bc: str  # "zero" | "periodic"


def default_config(n: int = 40, a: float = 0.01, bc: str = "zero") -> Params:
    d = 1.0 / (n + 1)
    return Params(a=a, dx=d, dy=d, bc=bc)


def stable_dt(p: Params) -> float:
    """The reference's explicit-stability step (examples/heat_2D.jl:72)."""
    dx2, dy2 = p.dx * p.dx, p.dy * p.dy
    return dx2 * dy2 / (2.0 * p.a * (dx2 + dy2))


def grid(n: int = 40, dtype=None):
    """Interior node coordinates (the reference's xs/ys cover the full
    (N+2) extent including ghosts, examples/heat_2D.jl:75-76)."""
    d = 1.0 / (n + 1)
    x = jnp.linspace(d, 1.0 - d, n, dtype=dtype)
    return jnp.meshgrid(x, x, indexing="ij")


def initial_condition(n: int = 40, dtype=None):
    """u₀ = sin(πx)sin(πy) (examples/heat_2D.jl:78-88)."""
    X, Y = grid(n, dtype)
    return jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)


def rhs(u, p: Params, t=None):
    """du = a·Δu over the (N, M) interior (diffusion!,
    examples/heat_2D.jl:41-62)."""
    up = pad_dirichlet(u) if p.bc == "zero" else pad_periodic(u)
    return p.a * laplacian_2d(up, p.dx, p.dy)


def rhs_df(u, p: Params, t=None):
    """a·Δu in df32 double-float arithmetic (``u`` a
    :class:`~newtonkrylov_tpu.df32.DF` pair).

    The stencil's neighbor−2u cancellation resolves in exact two-sum chains;
    the a/Δx² scale enters as a df32-split constant.  Pair with
    :func:`~newtonkrylov_tpu.timestep.implicit_euler_df` to march the 2-D
    heat equation with a ≤1e-8 acceptance residual on TPU — no emulated-f64
    op in the loop (tests/test_df32_problems.py pins it against the f64
    oracle).
    """
    from .. import df32 as dd

    pad = pad_dirichlet if p.bc == "zero" else pad_periodic
    up = dd.df_map(pad, u)
    return rhs_df_padded(up, u, p, t)


def rhs_df_padded(up, u, p: Params, t=None):
    """df32 RHS core on a pre-padded DF block (sharded marches: per-word
    halo exchange fills ``up``, cf. halo.sharded_residual_df_2d — exchange
    is pure data movement, so the two-sum chains see exactly the
    single-device values; tests/test_halo.py pins the parity)."""
    from .. import df32 as dd

    m2u = dd.scale_pow2(u, -2.0)
    lx = dd.add(dd.add(dd.shift(up, 1, 0), dd.shift(up, -1, 0)), m2u)
    ly = dd.add(dd.add(dd.shift(up, 0, 1), dd.shift(up, 0, -1)), m2u)
    return dd.add(
        dd.scale_const(lx, float(p.a) / (float(p.dx) * float(p.dx))),
        dd.scale_const(ly, float(p.a) / (float(p.dy) * float(p.dy))),
    )
