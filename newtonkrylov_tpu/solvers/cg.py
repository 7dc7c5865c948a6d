"""Preconditioned Conjugate Gradient, TPU-native.

The reference's CG path (``algo = :cg``, selected at
``examples/bratu.jl:58-62`` — the recommended solver for the SPD-like Bratu
step) is Krylov.jl's ``cg``; this is a from-scratch functional PCG under
``lax.while_loop`` with space-injected reductions (psum points for sharded
states) and Krylov.jl termination ``‖r‖ ≤ atol + rtol·‖r₀‖``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..spaces import EuclideanSpace, VectorSpace
from ..tree import tree_axpy, tree_size, tree_sub, tree_zeros_like
from .common import KrylovResult, as_operator, default_tols

__all__ = ["cg"]


class _Carry(NamedTuple):
    x: Any
    r: Any
    p: Any
    rz: jnp.ndarray
    resnorm: jnp.ndarray
    k: jnp.ndarray
    converged: jnp.ndarray
    breakdown: jnp.ndarray


def cg(
    A,
    b,
    x0=None,
    *,
    itmax: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    M: Optional[Callable] = None,
    space: Optional[VectorSpace] = None,
) -> KrylovResult:
    """Solve SPD A x = b with (left-)preconditioned CG.

    ``M`` applies the preconditioner inverse.  Stops at
    ``‖r‖ ≤ atol + rtol·‖r₀‖`` (rtol = η from the Newton forcing,
    src/Ariadne.jl:330-333) or itmax (default 2n, Krylov.jl convention).
    """
    Aop = as_operator(A)
    Mop = as_operator(M) if M is not None else None
    space = space or EuclideanSpace()

    if x0 is None:
        x0 = tree_zeros_like(b)
    dtype = jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)])
    atol, rtol = default_tols(dtype, atol, rtol)
    n = tree_size(b)
    if itmax is None:
        # global problem size: under shard_map tree_size is the local shard
        itmax = 2 * n * space.size_multiplier()

    def precond(r):
        return Mop(r) if Mop is not None else r

    r0 = space.mask_tree(tree_sub(b, Aop(x0)))
    z0 = precond(r0)
    rz0 = space.dot(r0, z0)
    beta0 = space.norm(r0)
    eps_abs = atol + rtol * beta0

    def cond(c: _Carry):
        return jnp.logical_not(c.converged | c.breakdown) & (c.k < itmax)

    def body(c: _Carry):
        # No per-iteration re-masking: operators must preserve the space's
        # mask (ghost entries stay zero — all library operators do), and the
        # space's dot/norm are mask-weighted regardless, so a leak could only
        # perturb ghost entries of the iterates, never the reductions.
        Ap = Aop(c.p)
        pAp = space.dot(c.p, Ap)
        # Note: a *negative*-definite A runs CG as the exact sign-mirror of
        # CG on (-A, -b), so only pAp == 0 is a true breakdown.  This matters:
        # the Bratu/heat stencil Jacobians are negative definite and the
        # reference's working recipe is plain CG on them (examples/bratu.jl:58-62).
        brk = pAp == 0
        safe = jnp.where(pAp != 0, pAp, 1.0)
        alpha = c.rz / safe
        x = tree_axpy(alpha, c.p, c.x)
        r = tree_axpy(-alpha, Ap, c.r)
        z = precond(r)
        # ‖r‖² and <r, z> are independent post-update reductions: fuse them
        # into ONE (2,)-psum round (space.dot2) — CG drops from 3 to 2
        # latency-bound reduction rounds per iteration on a mesh
        # (SCALING_r04 measured-collectives; the third is pAp, which the
        # alpha dependency keeps on its own round).
        rr, rz_new = space.dot2(r, r, r, z)
        resnorm = jnp.sqrt(rr.real)
        safe_rz = jnp.where(c.rz != 0, c.rz, 1.0)
        beta = rz_new / safe_rz
        p = tree_axpy(beta, c.p, z)
        return _Carry(
            x, r, p, rz_new, resnorm, c.k + 1,
            resnorm <= eps_abs, c.breakdown | brk,
        )

    init = _Carry(
        x0, r0, z0, rz0, beta0,
        jnp.zeros((), jnp.int32), beta0 <= eps_abs, jnp.zeros((), bool),
    )
    fin = lax.while_loop(cond, body, init)
    return KrylovResult(fin.x, fin.k, fin.resnorm, fin.converged, fin.breakdown)
