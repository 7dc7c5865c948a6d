"""Fast-Poisson (DST) preconditioner for 5-point-stencil Jacobians.

Diagonalizes the constant-coefficient part of ``A = o·S + d(x)·I`` exactly:
with zero-Dirichlet BCs the 5-point Laplacian's eigenvectors are the 2-D
discrete sine basis, so

    M⁻¹ r = DST₂D⁻¹[ DST₂D(r) / λ ],
    λ_{ij} = o·(2cos(iπ/(n+1)) + 2cos(jπ/(n+1))) + d̄,

with ``d̄`` the mean diagonal (the variable part of d is what CG mops up).
One application is four batched FFTs plus an eigenvalue scale — a handful of
*large* XLA ops, the shape that runs at full efficiency on TPU (contrast
multigrid's ~100 small ops per V-cycle, docs/design.md "Measured dead
ends").  For the Bratu/heat family the preconditioned CG typically needs
<10 iterations per Newton step, resolution-independent.

Coefficients (o, d) are probed exactly as in :mod:`newtonkrylov_tpu.mg`
(6 JVPs).  Like the other factories, invoked per Newton iteration.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .mg import probe_5point
from .operator import JacobianOperator

__all__ = ["dst1", "idst1", "fft_poisson"]


def dst1(x, axis: int = -1):
    """DST-I along ``axis`` via the odd extension + FFT.

    S_k = Σ_j x_j sin(π(j+1)(k+1)/(n+1)),  k = 0..n-1.
    """
    n = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape[:-1]
    z = jnp.zeros(shape + (2 * n + 2,), x.dtype)
    z = z.at[..., 1 : n + 1].set(x)
    z = z.at[..., n + 2 :].set(-x[..., ::-1])
    X = jnp.fft.fft(z, axis=-1)
    out = -0.5 * X.imag[..., 1 : n + 1]
    return jnp.moveaxis(out.astype(x.dtype), -1, axis)


def idst1(x, axis: int = -1):
    """Inverse DST-I (DST-I is self-inverse up to 2/(n+1))."""
    n = x.shape[axis]
    return dst1(x, axis) * (2.0 / (n + 1))


def _dst2(x):
    return dst1(dst1(x, 0), 1)


def _idst2(x):
    return idst1(idst1(x, 0), 1)


def fft_poisson(shift: str = "mean") -> Callable:
    """Preconditioner factory: exact DST inverse of o·S + d̄·I.

    ``shift`` selects the constant d̄ absorbed into the eigenvalues:
    ``"mean"`` (default) or ``"none"`` (pure Laplacian inverse).
    """

    def factory(J: JacobianOperator):
        o, d = probe_5point(J)
        n, m = d.shape
        dbar = jnp.mean(d) if shift == "mean" else -4.0 * o
        ci = 2.0 * jnp.cos(jnp.pi * jnp.arange(1, n + 1) / (n + 1))
        cj = 2.0 * jnp.cos(jnp.pi * jnp.arange(1, m + 1) / (m + 1))
        # S eigenvalues are ci+cj; A's constant part adds (dbar + 4o) - 4o = dbar
        lam = o * (ci[:, None] + cj[None, :] - 4.0) + (dbar + 4.0 * o)
        safe = jnp.where(jnp.abs(lam) > 1e-30, lam, 1.0)

        def apply(r):
            return _idst2(_dst2(r) / safe.astype(r.dtype))

        return apply

    return factory
