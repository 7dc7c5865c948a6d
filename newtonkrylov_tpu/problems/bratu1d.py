"""1-D Bratu problem ``y″ + λeʸ = 0`` with zero Dirichlet BCs
(examples/bratu.jl, examples/bratu_ka.jl; Kan2022 configuration).

Reference configuration (examples/bratu.jl:40-46): N = 10 000, λ = 3.51382,
Δx = 1/(N+1), u₀ = sin(πx); analytic solution via cosh with θ = 4.79173
(examples/bratu.jl:32-37).  The recommended solver is CG
(examples/bratu.jl:58-62); plain GMRES diverges (examples/bratu.jl:110-118).

Two residual forms with identical roots:

* :func:`residual` — the reference's scaling, ``(yᵣ−2y+yₗ)/Δx² + λeʸ``.
  Requires f64: at N = 10⁴ the 1/Δx² amplification puts the stencil's
  cancellation noise above f32 resolution.
* :func:`residual_scaled` — multiplied through by Δx²:
  ``(yᵣ−2y+yₗ) + Δx²λeʸ``.  Same Newton iteration counts (Eisenstat–Walker
  is scale-invariant), f32/TPU-friendly conditioning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "Params", "default_config", "residual", "residual_scaled",
    "residual_scaled_df", "true_solution", "initial_guess", "grid",
]

N_DEFAULT = 10_000
LAMBDA_DEFAULT = 3.51382
THETA = 4.79173  # for λ = 3.51382; the 2nd solution has θ = 4.8057


class Params(NamedTuple):
    dx: float
    lam: float


def default_config(n: int = N_DEFAULT, lam: float = LAMBDA_DEFAULT) -> Params:
    return Params(dx=1.0 / (n + 1), lam=lam)


def grid(n: int = N_DEFAULT, dtype=None):
    """Interior grid x ∈ (Δx, 1−Δx) (examples/bratu.jl:44)."""
    dx = 1.0 / (n + 1)
    return jnp.linspace(dx, 1.0 - dx, n, dtype=dtype)


def initial_guess(n: int = N_DEFAULT, dtype=None):
    """u₀ = sin(πx) (examples/bratu.jl:46)."""
    return jnp.sin(jnp.pi * grid(n, dtype))


def _stencil(y):
    y_l = jnp.concatenate([jnp.zeros(1, y.dtype), y[:-1]])
    y_r = jnp.concatenate([y[1:], jnp.zeros(1, y.dtype)])
    return y_r - 2.0 * y + y_l


def residual(y, p: Params):
    """Reference scaling (examples/bratu.jl:14-24): y″ + λeʸ with zero BCs."""
    return _stencil(y) / (p.dx * p.dx) + p.lam * jnp.exp(y)


def residual_scaled(y, p: Params):
    """Δx²-scaled form: (yᵣ−2y+yₗ) + Δx²λeʸ — identical roots, f32-safe."""
    return _stencil(y) + (p.dx * p.dx) * p.lam * jnp.exp(y)


def residual_scaled_df(y, p: Params):
    """Δx²-scaled residual in df32 double-float arithmetic.

    ``y`` is a :class:`~newtonkrylov_tpu.df32.DF` pair.  At the reference's
    N = 10⁴ the stencil cancellation sits ~8 decades below |y|, so plain f32
    floors ‖F‖ around 1e-3·‖F₀‖; this df32 form (exact two-sum shift chain +
    exponent-shifted Δx²λeʸ) reaches the 1e-8 target on TPU with no emulated
    f64 op — pass as ``newton_krylov_jit(..., residual_df=...)``.  Pinned
    against the f64 oracle in tests/test_df32_problems.py.
    """
    from .. import df32 as dd

    pad1 = lambda w: jnp.concatenate(  # noqa: E731
        [jnp.zeros(1, w.dtype), w, jnp.zeros(1, w.dtype)]
    )
    yp = dd.df_map(pad1, y)
    s = dd.neighbor_sum(yp, [(-1,), (1,)])
    s = dd.add(s, dd.scale_pow2(y, -2.0))
    return dd.add(s, dd.scaled_exp(y, float(p.dx) * float(p.dx) * float(p.lam)))


def true_solution(x, theta: float = THETA):
    """Closed-form solution (examples/bratu.jl:32-37)."""
    return -2.0 * jnp.log(jnp.cosh(theta * (x - 0.5) / 2.0) / jnp.cosh(theta / 4.0))
