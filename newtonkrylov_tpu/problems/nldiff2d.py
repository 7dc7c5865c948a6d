"""Steady quasilinear (nonlinear-coefficient) diffusion — variable-coefficient
Jacobian in EVERY stencil slot.

    ∇·(D(u)∇u) + g = 0  on the unit square,  D(u) = 1 + u²,  zero Dirichlet,

conservative (flux-form) discretization with arithmetic-mean face
diffusivities:

    F_ij = Σ_faces D_face·(u_nbr − u_ij)  (Δx²-scaled)  + b_ij,
    D_{i+1/2,j} = (D(u_ij) + D(u_{i+1,j})) / 2.

Every reference problem's Jacobian is ``o·S + d(x)·I`` (constant
off-diagonals); convdiff2d varies the off-diagonals *antisymmetrically*
(convection).  This module is the remaining case: a NONSYMMETRIC Jacobian
whose five coefficient fields all vary with the state —

    ∂F_ij/∂u_{i+1,j} = D_{i+1/2} + D'(u_{i+1,j})/2·(u_{i+1,j} − u_ij), …

— which is exactly what :func:`~newtonkrylov_tpu.mg.probe_5point_general`
recovers (six mod-3 colored JVPs) and what the constant-coefficient
DST/Chebyshev/``multigrid2d`` factories can NOT represent.  The working
on-device recipes are the general-probe family — single-level ADI and,
since round 5, the variable-coefficient multilevel
:func:`~newtonkrylov_tpu.mg.multigrid2d_general` (ADI-smoothed V-cycle on
the probed fields):

**Recipe map** (measured on CPU f64, tests/test_nldiff.py):

* ``newton_krylov_jit`` + ``algo="gmres"`` + ``M=precond.adi(4)``: from
  u₀ = 0, exact Newton converges in 7 outers with totals 43 → 49 → 55 → 62
  for n = 32 → 64 → 128 → 256 — near-flat growth, fully jitted on device.
  The df32 path (``krylov_dtype=f32`` + ``residual_df``) refines to 1e-8
  (30 inners at n = 64).
* ``M=mg.multigrid2d_general()``: 39 → 45 → 48 → 54 over the same sweep —
  the multilevel variant, built for the convection regime where it wins
  big (convdiff c=25: 51 vs ADI's 334 at n = 256); here diffusion
  dominates and both are near-flat.
* Constant-coefficient preconditioners mis-model the operator outright: at
  the default amp = 2 (diffusivity contrast 5×) the Laplacian-only DST
  FAILS to converge at n = 64 (6001 inners, unsolved) — the mis-modeled
  flux coefficients leave a preconditioned spectrum GMRES cannot traverse,
  where ADI's line solves carry the true local coefficients.

The forcing is manufactured from the discrete operator (convdiff2d
pattern): with u* = a·sin(πx)sin(πy), ``default_config`` stores
``b = −L_h(u*)`` so u* is the exact discrete root and solver correctness is
an equality check.  ``amp`` controls the diffusivity contrast
(max D/min D = 1 + amp²).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.stencil import pad_dirichlet

__all__ = [
    "Params",
    "default_config",
    "residual_scaled",
    "residual_scaled_padded",
    "residual_scaled_df",
    "initial_guess",
    "manufactured_solution",
    "grid",
]

N_DEFAULT = 64
AMP_DEFAULT = 2.0


class Params(NamedTuple):
    dx: float
    b: jnp.ndarray  # manufactured forcing, (n, n), Δx²-scaled


def grid(n: int = N_DEFAULT, dtype=None):
    dx = 1.0 / (n + 1)
    x = jnp.linspace(dx, 1.0 - dx, n, dtype=dtype)
    return jnp.meshgrid(x, x, indexing="ij")


def manufactured_solution(n: int = N_DEFAULT, amp: float = AMP_DEFAULT,
                          dtype=None):
    """u* = amp·sin(πx)sin(πy) — the exact discrete root."""
    X, Y = grid(n, dtype)
    return amp * jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)


def _operator_scaled(up):
    """Δx²-scaled flux-form operator Σ_faces D_face·(u_nbr − u) on a padded
    block (D evaluated on the padded state: Dirichlet ghosts carry u = 0,
    D = 1 — the physical wall diffusivity)."""
    D = 1.0 + up * up
    u = up[1:-1, 1:-1]
    Dc = D[1:-1, 1:-1]
    out = 0.0
    for nbr, Dn in (
        (up[2:, 1:-1], D[2:, 1:-1]),
        (up[:-2, 1:-1], D[:-2, 1:-1]),
        (up[1:-1, 2:], D[1:-1, 2:]),
        (up[1:-1, :-2], D[1:-1, :-2]),
    ):
        out = out + 0.5 * (Dc + Dn) * (nbr - u)
    return out


def default_config(n: int = N_DEFAULT, amp: float = AMP_DEFAULT,
                   dtype=None) -> Params:
    """Params with the manufactured forcing b = −L_h(u*) in ``dtype``
    (build with ``dtype=jnp.float64`` for an exact root, as convdiff2d)."""
    dx = 1.0 / (n + 1)
    us = manufactured_solution(n, amp, dtype)
    b = -_operator_scaled(pad_dirichlet(us))
    return Params(dx=dx, b=b)


def initial_guess(n: int = N_DEFAULT, dtype=None):
    """Zero start (detuned from the manufactured root)."""
    return jnp.zeros((n, n), dtype=dtype)


def residual_scaled(u, p: Params):
    """Δx²-scaled residual L_h(u) + b; root at the manufactured u*."""
    return residual_scaled_padded(pad_dirichlet(u), p)


def residual_scaled_padded(up, p: Params):
    """Residual core on a pre-padded block (ghosts from ``pad_dirichlet``
    on one device or halo exchange in the sharded path — the operator
    reads exactly one ghost ring, and D is evaluated pointwise on the
    padded state, so exchanged real-neighbor values reproduce the global
    flux coefficients at shard seams exactly)."""
    return _operator_scaled(up) + p.b.astype(up.dtype)


def residual_scaled_df(u, p: Params):
    """Δx²-scaled residual in df32 double-float arithmetic (``u`` a DF pair).

    Face diffusivities and flux differences resolve in double-word
    multiplies/two-sum chains; the forcing enters as an f64-split DF
    constant — the acceptance residual of the 1e-8 refined path, no
    emulated-f64 op anywhere (tests pin it against the f64 oracle).
    """
    from .. import df32 as dd

    up = dd.df_map(pad_dirichlet, u)
    one = jnp.float32(1.0)
    D = dd.add_f32(dd.mul(up, up), one)          # 1 + u² on the padded block
    uc = dd.shift(up, 0, 0)
    Dc = dd.shift(D, 0, 0)
    out = None
    for off in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        un = dd.shift(up, *off)
        Dn = dd.shift(D, *off)
        face = dd.scale_pow2(dd.add(Dc, Dn), 0.5)
        term = dd.mul(face, dd.sub(un, uc))
        out = term if out is None else dd.add(out, term)

    if p.b.dtype == jnp.float64:
        b_df = dd.df_from_f64(p.b)
    else:
        b_df = dd.DF(p.b, jnp.zeros_like(p.b))
    return dd.add(out, b_df)
