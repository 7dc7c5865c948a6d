"""BiCGStab and CGLS — completing the reference's solver menu.

The reference exposes ``algo = :bicgstab`` and ``:cgls`` (shown diverging on
Bratu at ``examples/bratu.jl:159-177`` — they are menu items, documented as
unsuitable there, but part of the capability surface).  Both are implemented
from scratch as fixed-shape ``lax.while_loop`` iterations.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..spaces import EuclideanSpace, VectorSpace
from ..tree import tree_axpy, tree_scale, tree_size, tree_sub, tree_zeros_like
from .common import KrylovResult, as_operator, default_tols

__all__ = ["bicgstab", "cgls"]


class _BCarry(NamedTuple):
    x: Any
    r: Any
    p: Any
    v: Any
    rho: jnp.ndarray
    alpha: jnp.ndarray
    omega: jnp.ndarray
    resnorm: jnp.ndarray
    k: jnp.ndarray
    converged: jnp.ndarray
    breakdown: jnp.ndarray


def bicgstab(
    A,
    b,
    x0=None,
    *,
    itmax: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    M: Optional[Callable] = None,
    N: Optional[Callable] = None,
    space: Optional[VectorSpace] = None,
) -> KrylovResult:
    """Stabilized bi-conjugate gradients for general square systems.

    M/N are left/right preconditioner inverses applied by operator
    composition (solve M·A·N y = M b, return x = N y).
    """
    Aop0 = as_operator(A)
    Mop = as_operator(M) if M is not None else None
    Nop = as_operator(N) if N is not None else None
    space = space or EuclideanSpace()

    def Aop(v):
        w = Nop(v) if Nop is not None else v
        w = Aop0(w)
        return Mop(w) if Mop is not None else w

    b_eff = Mop(b) if Mop is not None else b

    if x0 is None:
        x0 = tree_zeros_like(b)
    dtype = jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)])
    atol, rtol = default_tols(dtype, atol, rtol)
    if itmax is None:
        itmax = 2 * tree_size(b) * space.size_multiplier()

    r0 = space.mask_tree(tree_sub(b_eff, Aop(x0)))
    rhat = r0  # shadow residual
    beta0 = space.norm(r0)
    eps_abs = atol + rtol * beta0
    one = jnp.ones((), dtype)

    def cond(c: _BCarry):
        return jnp.logical_not(c.converged | c.breakdown) & (c.k < itmax)

    def body(c: _BCarry):
        rho_new = space.dot(rhat, c.r)
        brk = jnp.abs(rho_new) == 0
        safe = lambda d: jnp.where(d != 0, d, 1.0)
        beta = (rho_new / safe(c.rho)) * (c.alpha / safe(c.omega))
        p = tree_axpy(beta, tree_axpy(-c.omega, c.v, c.p), c.r)
        v = Aop(p)  # operators preserve the mask (see cg.py note)
        alpha = rho_new / safe(space.dot(rhat, v))
        s = tree_axpy(-alpha, v, c.r)
        t = Aop(s)
        # <t,t> and <t,s> are independent once t exists: one fused
        # (2,)-psum round instead of two (space.dot2; cf. cg.py)
        tt, ts = space.dot2(t, t, t, s)
        omega = ts / safe(tt)
        x = tree_axpy(omega, s, tree_axpy(alpha, p, c.x))
        r = tree_axpy(-omega, t, s)
        resnorm = space.norm(r)
        return _BCarry(
            x, r, p, v, rho_new, alpha, omega, resnorm, c.k + 1,
            resnorm <= eps_abs, c.breakdown | brk | (tt == 0),
        )

    init = _BCarry(
        x0, r0, tree_zeros_like(b), tree_zeros_like(b),
        one, one, one, beta0, jnp.zeros((), jnp.int32),
        beta0 <= eps_abs, jnp.zeros((), bool),
    )
    fin = lax.while_loop(cond, body, init)
    x = Nop(fin.x) if Nop is not None else fin.x
    return KrylovResult(x, fin.k, fin.resnorm, fin.converged, fin.breakdown)


class _LCarry(NamedTuple):
    x: Any
    r: Any          # b - A x   (residual in data space)
    s: Any          # Aᵀ r      (gradient in solution space)
    p: Any
    gamma: jnp.ndarray
    resnorm: jnp.ndarray
    k: jnp.ndarray
    converged: jnp.ndarray


def cgls(
    A,
    b,
    x0=None,
    *,
    At: Optional[Callable] = None,
    itmax: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    space: Optional[VectorSpace] = None,
) -> KrylovResult:
    """CG on the normal equations AᵀA x = Aᵀ b (least-squares).

    ``At`` applies Aᵀ; if ``A`` is a
    :class:`~newtonkrylov_tpu.operator.JacobianOperator` its ``rmv`` (reverse
    AD transpose, cf. src/Ariadne.jl:93-107) is used automatically.
    """
    Aop = as_operator(A)
    if At is None:
        if hasattr(A, "rmv"):
            At = A.rmv
        else:
            raise ValueError("cgls needs At= (or an operator with .rmv)")
    space = space or EuclideanSpace()

    dtype = jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)])
    atol, rtol = default_tols(dtype, atol, rtol)

    r0 = space.mask_tree(b) if x0 is None else space.mask_tree(tree_sub(b, Aop(x0)))
    s0 = At(r0)
    if x0 is None:
        x0 = tree_zeros_like(s0)
    if itmax is None:
        itmax = 2 * tree_size(x0) * space.size_multiplier()
    gamma0 = space.dot(s0, s0)
    beta0 = space.norm(r0)
    eps_abs = atol + rtol * beta0

    def cond(c: _LCarry):
        return jnp.logical_not(c.converged) & (c.k < itmax)

    def body(c: _LCarry):
        q = Aop(c.p)
        safe = lambda d: jnp.where(d != 0, d, 1.0)
        alpha = c.gamma / safe(space.dot(q, q))
        x = tree_axpy(alpha, c.p, c.x)
        r = tree_axpy(-alpha, q, c.r)
        s = At(r)
        # <s,s> and ||r||^2 are independent once s exists: one fused round
        gamma_new, rr = space.dot2(s, s, r, r)
        beta = gamma_new / safe(c.gamma)
        p = tree_axpy(beta, c.p, s)
        resnorm = jnp.sqrt(rr.real)
        return _LCarry(x, r, s, p, gamma_new, resnorm, c.k + 1, resnorm <= eps_abs)

    init = _LCarry(x0, r0, s0, s0, gamma0, beta0, jnp.zeros((), jnp.int32), beta0 <= eps_abs)
    fin = lax.while_loop(cond, body, init)
    return KrylovResult(fin.x, fin.k, fin.resnorm, fin.converged, jnp.zeros((), bool))
