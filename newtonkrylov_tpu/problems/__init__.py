"""PDE/ODE problem library.

The reference keeps half its capability surface in ``examples/`` (SURVEY.md);
here each example is a first-class module exposing pure residuals, default
configurations, initial conditions, and analytic solutions where they exist:

==================  =====================================================
module              reference example
==================  =====================================================
``simple``          examples/simple.jl (Kelley2003 2×2 system)
``bratu1d``         examples/bratu.jl / bratu_ka.jl (1-D Bratu, N=10000)
``bratu2d``         2-D Bratu Δu + λeᵘ = 0 (the BASELINE flagship)
``bvp``             examples/bvp.jl (Kelley2022 two-point BVP)
``heat1d``          examples/heat_1D.jl (FD heat, Dirichlet/periodic)
``heat2d``          examples/heat_2D.jl (5-point diffusion, halo layout)
``heat1d_dg``       examples/heat_1D_DG.jl (DG / upwind operator composition)
``spring``          examples/spring.jl (harmonic oscillator)
``convdiff2d``      beyond reference: nonsymmetric convection–diffusion
                    (the GMRES-required regime; manufactured exact root)
``nldiff2d``        beyond reference: quasilinear diffusion ∇·(D(u)∇u)
                    (variable coefficients in every Jacobian stencil slot
                    — the probe_5point_general/ADI showcase)
==================  =====================================================
"""

from . import (bratu1d, bratu2d, bvp, convdiff2d, heat1d, heat1d_dg,
               heat2d, nldiff2d, simple, spring)

__all__ = [
    "simple", "bratu1d", "bratu2d", "bvp", "heat1d", "heat2d", "heat1d_dg",
    "spring", "convdiff2d", "nldiff2d",
]
