"""Steady 2-D convection–diffusion (viscous Burgers type) — **nonsymmetric**.

    Δu − c·u·(u_x + u_y) + g = 0   on the unit square, zero Dirichlet BCs,

discretized with the 5-point Laplacian and central first differences.  The
convection term makes the Jacobian J = S − c·diag(u_x+u_y) − c·diag(u)·D
**non-self-adjoint** — every 2-D problem the reference ships (bratu, heat)
is symmetric, so this module is the library's coverage of the regime where
``algo="gmres"``/``"fgmres"`` (SURVEY.md §2 C19's recipe gallery,
`/root/reference/examples/bratu.jl:110-157`) is *required* rather than a
drop-in alternative: CG's three-term recurrence has no convergence theory
off the SPD cone.  The DST Poisson preconditioner captures the Laplacian
part exactly (`fftprec.py`); see the measured recipe map below for where
that is enough and where ILU(0) takes over.

The forcing ``g`` is *manufactured from the discrete operator*: with
u* = sin(πx)sin(πy) on the grid, ``default_config`` stores
``b = −L_h(u*_grid)`` so that u* is the **exact discrete root** — solver
correctness is an equality check against a known state, not a
discretization-error bound (the 2-D analogue of the reference's
analytic-solution checks, `/root/reference/examples/bratu.jl:33-37`).

Scaling follows the library convention (problems/bratu1d.py): the residual
is the Δx²-scaled form — ``(Σ neighbors − 4u) − (c·Δx/2)·u·(δ_x u + δ_y u)
+ b`` — whose entries are O(Δx²‖u‖), f32-safe, with identical roots.

**Recipe map** (measured on CPU f64, tests/test_convdiff.py):

* **Resolution-robust, convection-dominated — variable-coefficient
  multigrid** (round 5): ``algo="gmres"`` +
  ``M=mg.multigrid2d_general()`` — the ADI-smoothed V-cycle on the
  probed nonsymmetric fields.  c = 25 totals **31 → 42 → 48 → 51** for
  n = 32 → 64 → 128 → 256 (1.65× over an 8× size span): the multilevel
  answer to single-level ADI's ~n^0.65 growth below.  Per-apply cost is
  ~2.3× an ADI(4) apply (Σ-levels of 8 fine-grid-equivalent tridiagonal
  batch solves), repaid ~6.5× in iteration count at n = 256 — and on
  TPU the inner count is also what prices the GMRES basis sweep:
  measured on real v5e at the production df32/f32 bench config (256²,
  c = 25, 1e-8), **13.6 ms/solve (27 inners) vs 107.0 ms (441) for
  single-level ADI**, and 49.2 ms / 29 inners at 512² (counts flat
  through the next doubling) — the BENCH_r05 convection lanes.  The
  spectral ground (tests/test_spectral.py): the MG-general-preconditioned
  Jacobian's Ritz values at c = 25 cluster in **[0.981, 1.003]**
  (near-identity; |imag| < 4e-3) vs ADI's [0.41, 1.07].
* **Single-level, any convection strength (incl. c = 25) — on-device ADI**:
  ``newton_krylov_jit`` + ``algo="gmres"``, ``M=precond.adi(sweeps=4)``,
  ``krylov_kwargs={"restart": None, "itmax": ..., "ortho_block": 32}``
  (ADI also tolerates ``restart=80``, the bench lane's cheaper recipe —
  counts 334 vs 290 full-space at n = 256; ``ortho_block`` makes the
  full-space basis sweep track the active size, ~3× on TPU).  The alternating-
  direction preconditioner solves each direction's transport *exactly along
  lines* (batched Thomas solves on the probed nonsymmetric stencil,
  precond.py), so it is immune to the convection strength that breaks the
  Laplacian-only DST.  Measured totals (4 outers at c = 2 / 7 at c = 25):
  c = 2: 18 → 21 → 24 for n = 32 → 64 → 128 (flatter than DST, below);
  c = 25: 77 → 121 → 190 → 290 for n = 32 → 64 → 128 → 256 — ~2.6–4.4×
  below host-ILU's ≈ 5·n at the same sizes, with every op jitted on device.
  Sweeps beyond 4 give diminishing returns (c = 25, n = 64: 121/103/92 for
  4/6/8 sweeps): the H–V commutator model error, not cycle quality,
  dominates.  Composes with the production mixed-precision path
  (``krylov_dtype=jnp.float32`` + ``residual_df=residual_scaled_df``:
  c = 25, n = 64 refines to 1e-8 in 7 outers / 89 inners) and with
  sharding (``adi(axis_names=...)`` = zero-communication block-ADI;
  189 inners on a 2×2 mesh vs 121 single-device — the recorded
  additive-Schwarz penalty, tests/test_convdiff.py).
* **Moderate convection (c ≲ 4, the default c = 2)** — ``algo="gmres"``,
  ``M=fft_poisson()``, ``krylov_kwargs={"restart": None, "itmax": ...}``
  (non-restarted: the preconditioned spectrum has a few h-growing outliers,
  see below, and restarted GMRES cycles on them).  Per-outer counts at
  c = 2: 14 → 24 → 47 for n = 32 → 64 → 128, matching a scipy full-GMRES
  oracle on the densely materialized preconditioned operator (18 → 27 at
  32 → 64).  The growth is the *discrete* operator's, not the solver's:
  continuum compactness of Δ⁻¹(w + u·∇) bounds only finitely many outliers,
  while the discrete norm ‖S⁻¹C‖ ~ c/(2π²·Δx) grows, and the linearization's
  zeroth-order potential c·(u_x+u_y) rivals Δ's lowest eigenvalue 2π² once
  c ≳ π√2 — the DST-preconditioned spectrum at the root grows a cluster of
  negative-real eigenvalues: 6/1024 isolated outliers at c = 2 (n = 32;
  unrestarted GMRES eats isolated outliers, the recipe works), 24 at c = 6
  (real range [−90, +14]), 91 at c = 25 — measured matrix-free by Arnoldi
  Ritz values and dense-cross-checked, tests/test_spectral.py (the ADI
  spectrum at c = 25 is by contrast entirely positive in [0.41, 1.07]).
  Restarted DST-GMRES then stalls outright, and even an unrestarted
  400-dim space limps at ~350 inners per outer (2401 total at c = 25,
  n = 96 — ~15–26× the ADI recipe's cost at the same tolerance,
  examples/convdiff_2d.py).
* **Host-side alternative (any c)** — the reference's own robust family
  (`/root/reference/examples/bratu.jl:121-128`):
  ``newton_krylov`` (host driver) + ``N=ilu0(offsets=(-n, -1, 0, 1, n))``,
  exact Newton.  Solves c = 25 from the zero start in 7 outers at every
  tested size; counts ≈ 5·n per solve (ILU's usual O(√κ) growth) and a
  ``pure_callback`` host round-trip per inner apply — kept as the
  literal-parity recipe; prefer ADI on TPU.

Forcing: at c = 2 both exact Newton (``forcing=None``, 4 outers) and the
Eisenstat–Walker default (9 outers, looser inners) converge; at large c the
first Newton step from u₀ = 0 overshoots (‖F‖ 0.40 → 1.33) and E-W's
η_max = 0.999 then keeps the inner tolerance too loose to recover — the
oversolving/undersolving sensitivity the reference documents by tuning
η_max = 0.68949 on its 2×2 system (`/root/reference/examples/simple.jl:44`).
Use ``forcing=None`` (ILU recipe) when convection-dominated.
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
    "residual_scaled_df_padded",
    "initial_guess",
    "manufactured_solution",
    "grid",
]

N_DEFAULT = 128
C_DEFAULT = 2.0


class Params(NamedTuple):
    dx: float
    c: float
    b: jnp.ndarray  # manufactured forcing, (n, n), Δx²-scaled


def grid(n: int = N_DEFAULT, dtype=None):
    dx = 1.0 / (n + 1)
    x = jnp.linspace(dx, 1.0 - dx, n, dtype=dtype)
    return jnp.meshgrid(x, x, indexing="ij")


def manufactured_solution(n: int = N_DEFAULT, dtype=None):
    """u* = sin(πx)sin(πy) on the interior grid — the exact discrete root."""
    X, Y = grid(n, dtype)
    return jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)


def _operator_scaled(up, u, c: float, dx: float):
    """Δx²-scaled discrete operator L_h(u) (no forcing): 5-point stencil
    minus central-difference convection, reading one ghost ring of ``up``."""
    stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    d0 = up[2:, 1:-1] - up[:-2, 1:-1]
    d1 = up[1:-1, 2:] - up[1:-1, :-2]
    return stencil - (0.5 * dx * c) * u * (d0 + d1)


def default_config(n: int = N_DEFAULT, c: float = C_DEFAULT, dtype=None) -> Params:
    """Params with the manufactured forcing b = −L_h(u*) in ``dtype``.

    Build with ``dtype=jnp.float64`` (CPU / df32-refined paths) for an exact
    root; in f32 the root is exact to f32 rounding of b.  The cell Péclet
    number c·max|u*|·Δx/2 must stay < 1 for the central scheme — ≈ 0.008 at
    the defaults, and well under 1 even at c = 25, n = 32.
    """
    dx = 1.0 / (n + 1)
    us = manufactured_solution(n, dtype)
    b = -_operator_scaled(pad_dirichlet(us), us, c, dx)
    return Params(dx=dx, c=c, b=b)


def initial_guess(n: int = N_DEFAULT, dtype=None):
    """Zero start (detuned from the manufactured root)."""
    return jnp.zeros((n, n), dtype=dtype)


def residual_scaled(u, p: Params):
    """Δx²-scaled residual L_h(u) + b; root at the manufactured u*."""
    return residual_scaled_padded(pad_dirichlet(u), p)


def residual_scaled_padded(up, p: Params):
    """Residual core on a pre-padded block (ghosts from ``pad_dirichlet`` on
    one device or halo exchange in the sharded path — position dependence
    enters only through the per-gridpoint field ``p.b``, so the overlapped
    ``halo.sharded_residual_2d`` strip re-evaluation applies directly)."""
    u = up[1:-1, 1:-1]
    return _operator_scaled(up, u, p.c, p.dx) + p.b.astype(u.dtype)


def _b_df(p: Params):
    from .. import df32 as dd

    if p.b.dtype == jnp.float64:
        return dd.df_from_f64(p.b)
    return dd.DF(p.b, jnp.zeros_like(p.b))


def residual_scaled_df(u, p: Params):
    """Δx²-scaled residual in df32 double-float arithmetic (``u`` a DF pair).

    The acceptance residual of the 1e-8 refined path (driver kwarg
    ``residual_df``): the stencil cancellation resolves in exact two-sum
    chains, the convection product runs a double-word multiply, and the
    manufactured forcing enters as an f64-split DF constant — no emulated
    f64 op anywhere (df32 module docstring).
    """
    from .. import df32 as dd

    up = dd.DF(pad_dirichlet(u.hi), pad_dirichlet(u.lo))
    return residual_scaled_df_padded(up, u, p)


def residual_scaled_df_padded(up, u, p: Params):
    """df32 residual core on a pre-padded DF block (sharded: per-word halo
    exchange via ``halo.sharded_residual_df_2d``)."""
    from .. import df32 as dd

    s = dd.neighbor_sum(up, [(1, 0), (-1, 0), (0, 1), (0, -1)])
    s = dd.add(s, dd.scale_pow2(u, -4.0))
    d0 = dd.sub(dd.shift(up, 1, 0), dd.shift(up, -1, 0))
    d1 = dd.sub(dd.shift(up, 0, 1), dd.shift(up, 0, -1))
    conv = dd.scale_const(dd.mul(u, dd.add(d0, d1)), -0.5 * p.dx * p.c)
    return dd.add(dd.add(s, conv), _b_df(p))
