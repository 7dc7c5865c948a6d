"""Kelley2003 2×2 nonlinear system (examples/simple.jl:6-14, test/runtests.jl:4-13).

``F(x) = [x₁² + x₂² − 2,  e^{x₁−1} + x₂² − 2]``; root at (1, 1) (another root
exists near (−0.478, 1.331)).  Documented starting points: [2.0, 0.5],
[2.5, 3.0], [3.0, 4.0] (examples/simple.jl:25-44) and [3.0, 5.0]
(test/runtests.jl:20).  The tuned forcing for the third trace is
``EisenstatWalker(η_max = 0.68949)`` (examples/simple.jl:44).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["residual", "residual_df", "STARTS", "TUNED_ETA_MAX", "ROOT"]

ROOT = (1.0, 1.0)
STARTS = ([2.0, 0.5], [2.5, 3.0], [3.0, 4.0], [3.0, 5.0])
TUNED_ETA_MAX = 0.68949


def residual(x, p=None):
    return jnp.stack([
        x[0] * x[0] + x[1] * x[1] - 2.0,
        jnp.exp(x[0] - 1.0) + x[1] * x[1] - 2.0,
    ])


def residual_df(x, p=None):
    """df32 residual (``x`` a DF pair): squares as double-word multiplies,
    the exponential via the df32 ``exp`` (argument shifted by the exact
    integer −1), constants folded with exact two-sums."""
    from .. import df32 as dd

    x0 = dd.df_map(lambda w: w[0:1], x)
    x1 = dd.df_map(lambda w: w[1:2], x)
    sq1 = dd.mul(x1, x1)
    r0 = dd.add_f32(dd.add(dd.mul(x0, x0), sq1), jnp.float32(-2.0))
    r1 = dd.add_f32(dd.add(dd.exp(dd.add_f32(x0, jnp.float32(-1.0))), sq1),
                    jnp.float32(-2.0))
    return dd.DF(jnp.concatenate([r0.hi, r1.hi]),
                 jnp.concatenate([r0.lo, r1.lo]))
