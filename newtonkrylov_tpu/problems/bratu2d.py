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

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencil import laplacian_2d, pad_dirichlet

__all__ = [
    "Params",
    "default_config",
    "residual",
    "residual_scaled",
    "residual_scaled_df",
    "residual_scaled_df_padded",
    "residual_scaled_aligned",
    "aligned_setup",
    "initial_guess",
    "grid",
]

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


def residual_scaled_df(u, p: Params):
    """Δx²-scaled residual in df32 double-float arithmetic.

    ``u`` is a :class:`~newtonkrylov_tpu.df32.DF` pair; returns a ``DF``
    residual whose ``hi`` is the residual to f32 *relative* accuracy — the
    stencil's neighbors−4u cancellation is resolved error-free in two-sum
    chains, so this replaces the f64 acceptance residual of the refined
    driver at VPU-f32 speed (see df32 module docstring and
    benchmarks/solve_bisect.py for why emulated f64 is avoided).
    """
    from .. import df32 as dd

    return residual_scaled_df_padded(
        dd.DF(pad_dirichlet(u.hi), pad_dirichlet(u.lo)), u, p
    )


def residual_scaled_df_padded(up, u, p: Params):
    """df32 residual core on a pre-padded DF block.

    ``up`` is the (n+2, m+2) ghost-padded DF pair (ghosts from
    :func:`~newtonkrylov_tpu.ops.stencil.pad_dirichlet` on one device, or
    from per-word halo exchange in the sharded path —
    :func:`newtonkrylov_tpu.halo.sharded_residual_df_2d`); ``u`` the
    unpadded interior DF.  Assembled from the df32 stencil combinators
    (padded-shift two-sum chain; −4u exact power-of-two scale; the Δx²λ
    constant enters eᵘ through an exponent shift — see
    :func:`~newtonkrylov_tpu.df32.scaled_exp` for why not ``x·c_hi +
    x·c_lo``).
    """
    from .. import df32 as dd

    s = dd.neighbor_sum(up, [(1, 0), (-1, 0), (0, 1), (0, -1)])
    s = dd.add(s, dd.scale_pow2(u, -4.0))
    return dd.add(s, dd.scaled_exp(u, float(p.dx) * float(p.dx) * float(p.lam)))


def residual_scaled_aligned(u, p: Params):
    """Δx²-scaled residual on the DMA-aligned ghost layout (see
    kernels/stencil2d.py) with a custom-JVP that dispatches the Krylov hot
    matvec to the fused stencil kernel.

    State is the (n+8, round_up(n+2,128)) ghost array; pair with
    ``MaskedSpace(aligned_mask(n))`` so reductions see only the interior.
    """
    from ..kernels import stencil2d as k

    n = u.shape[0] - 8
    scale = p.dx * p.dx * p.lam

    @jax.custom_jvp
    def F(u):
        mask = k.aligned_mask(n, u.dtype)
        up = jnp.roll(u, 1, axis=0)
        dn = jnp.roll(u, -1, axis=0)
        left = jnp.roll(u, 1, axis=1)
        right = jnp.roll(u, -1, axis=1)
        lap = up + dn + left + right - 4.0 * u
        return (lap + scale * jnp.exp(u)) * mask

    @F.defjvp
    def F_jvp(primals, tangents):
        (uu,) = primals
        (v,) = tangents
        y = F(uu)
        mask = k.aligned_mask(n, uu.dtype)
        w = scale * jnp.exp(uu) * mask  # zero on ghosts, as the kernel requires
        return y, k.stencil_jvp_pallas(v, w, n)

    return F(u)


def aligned_setup(n: int = N_DEFAULT, lam: float = LAMBDA_DEFAULT, dtype=jnp.float32):
    """(u0_aligned, params, space) for the Pallas fast path.

    The returned :class:`~newtonkrylov_tpu.spaces.MaskedSpace` restricts all
    solver reductions to the interior of the ghost-carrying layout.
    """
    from ..kernels import stencil2d as k
    from ..spaces import MaskedSpace

    p = default_config(n, lam)
    u0 = k.aligned_wrap(initial_guess(n, dtype))
    space = MaskedSpace(k.aligned_mask(n, jnp.dtype(dtype)))
    return u0, p, space
