"""Pure-XLA stencil building blocks.

The reference applies boundary conditions by *mutating* the state inside the
residual (``bc!(u)``, examples/heat_1D.jl:16-18; ghost-cell fills,
examples/heat_2D.jl:15-38) before a loopy stencil.  The functional TPU
re-design expresses the same thing as ``u → padded(u) → stencil`` pure
transforms: ghost values are materialized by ``jnp.pad`` (XLA fuses the pad
into the stencil's gather), and the Jacobian structure — identity-like rows at
Dirichlet boundaries — is preserved because the pad value does not depend
on ``u``.

These are the XLA baselines; :mod:`newtonkrylov_tpu.kernels` provides fused
Pallas versions of the hot combinations, and :mod:`newtonkrylov_tpu.halo`
replaces the pads with ``ppermute`` neighbor exchange for sharded domains.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pad_dirichlet", "pad_periodic", "laplacian_1d", "laplacian_2d"]


def pad_dirichlet(u, value=0.0):
    """Surround with a constant ghost ring (cf. bc_zero!, examples/heat_2D.jl:29-38)."""
    return jnp.pad(u, 1, mode="constant", constant_values=value)


def pad_periodic(u):
    """Surround with wrap-around ghosts (cf. bc_periodic!, examples/heat_2D.jl:15-27).

    Unlike the reference's ghost fill (which wraps rows and columns
    sequentially, leaving corners one update stale), ``jnp.pad(wrap)`` fills
    corners consistently — irrelevant for 5-point stencils, which never read
    corners.
    """
    return jnp.pad(u, 1, mode="wrap")


def laplacian_1d(u_padded, dx):
    """Second difference over a padded 1-D array: returns interior of size n."""
    return (u_padded[2:] - 2.0 * u_padded[1:-1] + u_padded[:-2]) / (dx * dx)


def laplacian_2d(u_padded, dx, dy):
    """5-point Laplacian over a padded 2-D array (cf. diffusion!,
    examples/heat_2D.jl:45-62): returns the (N, M) interior."""
    c = u_padded[1:-1, 1:-1]
    return (
        (u_padded[2:, 1:-1] - 2.0 * c + u_padded[:-2, 1:-1]) / (dx * dx)
        + (u_padded[1:-1, 2:] - 2.0 * c + u_padded[1:-1, :-2]) / (dy * dy)
    )
