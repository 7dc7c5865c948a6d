"""Differentiable Newton–Krylov solves (implicit function theorem).

A capability with no reference analog (SURVEY.md lists none): make the
*solution map* ``p ↦ u*(p)`` of ``F(u, p) = 0`` differentiable, so solves
compose with ``jax.grad``/``jax.jvp`` for PDE-constrained optimization,
sensitivity analysis, and end-to-end training around implicit layers.

Reverse mode uses the adjoint equation instead of differentiating through
the Newton iteration (which would be both wrong-costed and unsupported
through ``lax.while_loop``):

    dL/dp = −(∂F/∂p)ᵀ · J⁻ᵀ · dL/du       with J = ∂F/∂u at u*.

The adjoint solve ``Jᵀλ = g`` reuses the same matrix-free Krylov machinery
on :class:`~newtonkrylov_tpu.operator.AdjointOperator` (reverse-mode AD
transpose, cf. src/Ariadne.jl:93-107); ``∂F/∂p`` is one ``jax.vjp``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import solvers
from .forcing import EisenstatWalker
from .newton import newton_krylov_jit
from .operator import JacobianOperator
from .spaces import VectorSpace
from .tree import tree_scale, tree_zeros_like

__all__ = ["make_implicit_solver"]


def make_implicit_solver(
    F: Callable,
    *,
    adjoint_algo: str = "bicgstab",
    adjoint_kwargs: Optional[dict] = None,
    space: Optional[VectorSpace] = None,
    **newton_kwargs,
) -> Callable:
    """Build a differentiable solver ``solve(u0, p) -> u*``.

    ``newton_kwargs`` configure the forward :func:`newton_krylov_jit` solve;
    ``adjoint_algo``/``adjoint_kwargs`` the linear adjoint solve.  The
    default is BiCGStab (constant memory, no restart stagnation); pass
    ``adjoint_algo="cg"`` for symmetric Jacobians (exact for the stencil
    problems here) or non-restarted GMRES
    (``adjoint_kwargs={"restart": None, "itmax": <static>}``) for hard
    nonsymmetric ones — restarted GMRES can silently stagnate and corrupt
    gradients, so prefer methods that run to convergence.

    Gradients flow to ``p`` (and to any arrays closed over inside ``F`` if
    passed through ``p``); the cotangent for ``u0`` is zero — the root does
    not depend on the initial guess (assuming convergence to the same
    branch).
    """
    adjoint_kwargs = dict(adjoint_kwargs or {})
    adjoint_kwargs.setdefault("rtol", 1e-10)
    adjoint_kwargs.setdefault("atol", 0.0)
    if space is not None:
        adjoint_kwargs.setdefault("space", space)
        newton_kwargs.setdefault("space", space)

    def _solve(u0, p):
        u, _info = newton_krylov_jit(F, u0, p, **newton_kwargs)
        return u

    solve = jax.custom_vjp(_solve)

    def fwd(u0, p):
        u = _solve(u0, p)
        return u, (u, p)

    def bwd(residuals, g):
        u, p = residuals
        J = JacobianOperator(F, u, p)
        # Adjoint solve Jᵀ λ = g
        lam = solvers.solve(adjoint_algo, J.T, g, **adjoint_kwargs).x
        # dp = −(∂F/∂p)ᵀ λ
        _, vjp_p = jax.vjp(lambda pp: F(u, pp), p)
        (dp,) = vjp_p(lam)
        dp = jax.tree.map(lambda l: -l, dp)
        return tree_zeros_like(u), dp

    solve.defvjp(fwd, bwd)
    return solve
