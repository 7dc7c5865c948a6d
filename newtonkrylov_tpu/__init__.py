"""newtonkrylov_tpu — a TPU-native Jacobian-free Newton–Krylov framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
vchuravy/NewtonKrylov.jl ("Ariadne", /root/reference): an inexact-Newton outer
loop with Eisenstat–Walker forcing drives matrix-free GMRES/FGMRES/CG/
BiCGStab/CGLS inner solves whose Jacobian-vector products come from exact
forward-mode AD (``jax.linearize``); pluggable left/right preconditioners
(nested-Krylov, Jacobi, host-side ILU(0) in C++), implicit time-steppers
(backward Euler, midpoint, trapezoid) as residual wrappers, a PDE problem
library with analytic parity tests, fused Pallas stencil-JVP kernels, and a
halo-exchange domain partitioner (``shard_map`` + ICI ``ppermute``) for
multi-chip scaling.

Public API parity: the reference exports exactly ``newton_krylov`` and
``newton_krylov!`` (src/Ariadne.jl:3); here the functional pair is
:func:`newton_krylov` (host-stepped) and :func:`newton_krylov_jit`
(one XLA program).
"""

from . import df32, fftprec, mg, precond, problems, spectral, timestep
from .continuation import pseudo_transient
from .implicit import make_implicit_solver
from .forcing import EisenstatWalker, Fixed, Forcing
from .newton import NewtonInfo, Stats, newton_krylov, newton_krylov_jit
from .operator import (
    AdjointOperator,
    JacobianOperator,
    materialize_banded,
    materialize_dense,
)
from .solvers import KrylovResult, bicgstab, cg, cgls, fgmres, gmres
from .spaces import EuclideanSpace, MaskedSpace, ShardedSpace, VectorSpace
from .timestep import integrate, integrate_scan

__version__ = "0.1.0"

__all__ = [
    "newton_krylov",
    "newton_krylov_jit",
    "NewtonInfo",
    "Stats",
    "Forcing",
    "Fixed",
    "EisenstatWalker",
    "JacobianOperator",
    "AdjointOperator",
    "materialize_dense",
    "materialize_banded",
    "gmres",
    "fgmres",
    "cg",
    "bicgstab",
    "cgls",
    "KrylovResult",
    "VectorSpace",
    "EuclideanSpace",
    "MaskedSpace",
    "ShardedSpace",
    "integrate",
    "integrate_scan",
    "pseudo_transient",
    "df32",
    "fftprec",
    "make_implicit_solver",
    "mg",
    "precond",
    "problems",
    "spectral",
    "timestep",
]
