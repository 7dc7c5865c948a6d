"""Matrix-free spectral diagnostics: Lanczos / Arnoldi Ritz values.

The reference studies its step Jacobians by **materializing** them and
calling dense ``rank``/``cond`` (``examples/heat_1D.jl:55-93`` via
``examples/implicit.jl:41-50`` → ``collect(J)``, src/Ariadne.jl:140-162) —
fine at N=100, impossible at 2048².  This module gives the same diagnostics
matrix-free, at any size the operator itself runs at:

* :func:`lanczos_tridiag` — k-step Lanczos on a symmetric operator (full
  reorthogonalization by default: one CGS projection against the stacked
  basis per step, the same batched-reduction shape as the GMRES CGS2
  orthogonalizer — TPU-friendly, no sequential kdot loop).
* :func:`extreme_eigs` — (λ_min, λ_max) Ritz estimates from Lanczos;
  with ``k = n`` they are the exact spectrum to fp tolerance.  Feeds
  ``precond.chebyshev(bounds=...)`` when the probed Gershgorin interval is
  too loose.
* :func:`arnoldi_hessenberg` / :func:`ritz_values` — nonsymmetric Ritz
  values from a k-step Arnoldi factorization (the eig of the small (k, k)
  Hessenberg runs on host — it is O(k³) on k ≤ ~100, not device work).
* :func:`cond2_estimate` — matrix-free 2-norm condition estimate via
  Lanczos on the normal operator ``AᵀA`` (σ = √λ), the scalable analogue of
  the reference's ``cond(collect(J))`` study.

All iterations are fixed-shape ``lax.fori_loop`` bodies over a stacked
basis, jittable and space-aware (pass a
:class:`~newtonkrylov_tpu.spaces.ShardedSpace` to run the whole diagnostic
under ``shard_map`` with psum reductions — reductions are the only
communication).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .operator import LinearOperator
from .spaces import EuclideanSpace, VectorSpace
from .tree import (
    tree_axpy,
    tree_basis_combine,
    tree_get_row,
    tree_scale,
    tree_set_row,
    tree_stack_like,
)

__all__ = [
    "FnOperator",
    "lanczos_tridiag",
    "extreme_eigs",
    "arnoldi_hessenberg",
    "ritz_values",
    "cond2_estimate",
]


class FnOperator(LinearOperator):
    """Wrap a plain linear function ``v → A v`` as an operator.

    Used here for the normal operator ``v → Aᵀ(A v)``; generally useful for
    handing ad-hoc linear maps to the solvers/diagnostics.
    """

    def __init__(self, fn: Callable, example_in: Any, rfn: Optional[Callable] = None):
        self.fn = fn
        self.rfn = rfn
        self.example_in = example_in

    def mv(self, v):
        return self.fn(v)

    def rmv(self, w):
        if self.rfn is None:
            raise NotImplementedError("FnOperator built without an adjoint")
        return self.rfn(w)

    def mm(self, V):
        return jax.vmap(self.fn)(V)


def _normalize(space, v):
    nrm = space.norm(v)
    safe = jnp.where(nrm > 0, nrm, 1.0)
    return tree_scale(1.0 / safe, v), nrm


def lanczos_tridiag(
    A,
    v0: Any,
    k: int,
    *,
    space: Optional[VectorSpace] = None,
    reorth: bool = True,
):
    """k-step Lanczos on a **symmetric** operator A.

    Returns ``(alpha, beta, V, m)``: diagonal ``alpha`` (k,), off-diagonal
    ``beta`` (k,) (``beta[j] = T[j+1, j]``; ``beta[k-1]`` is the residual
    coupling), the stacked orthonormal basis ``V`` (k rows), and ``m`` —
    the number of genuine steps.  On breakdown (invariant subspace found,
    β≈0) ``m < k``: the leading (m, m) block of T is exact and rows past it
    are zero padding.

    ``reorth=True`` (default) does one full classical-Gram-Schmidt
    projection per step against all k stacked rows (masked, fixed shape):
    O(k·n) extra traffic that keeps Ritz values trustworthy — without it
    Lanczos famously produces ghost copies of converged extremes.
    """
    space = space or EuclideanSpace()
    q, _ = _normalize(space, v0)
    dtype = space.norm(v0).dtype

    V0 = tree_set_row(tree_stack_like(q, k), 0, q)
    alpha0 = jnp.zeros((k,), dtype)
    beta0 = jnp.zeros((k,), dtype)

    def body(j, carry):
        V, alpha, beta, q, q_prev, beta_prev, m, live = carry
        w = A.mv(q)
        a = space.dot(q, w)
        w = tree_axpy(-a, q, w)
        w = tree_axpy(-beta_prev, q_prev, w)
        if reorth:
            # one masked CGS pass against the full stacked basis (rows > j
            # are zero, so they contribute nothing — fixed shapes under jit)
            coeffs = space.project_rows(V, w)
            w = jax.tree.map(lambda wl, cl: wl - cl, w, tree_basis_combine(V, coeffs))
        b = space.norm(w)
        ok = live & (b > 10.0 * jnp.finfo(dtype).eps * jnp.abs(a))
        q_next = tree_scale(jnp.where(ok, 1.0 / jnp.where(b > 0, b, 1.0), 0.0), w)
        V = lax.cond(
            (j + 1 < k) & ok,
            lambda V_: tree_set_row(V_, j + 1, q_next),
            lambda V_: V_,
            V,
        )
        alpha = alpha.at[j].set(jnp.where(live, a, 0.0))
        beta = beta.at[j].set(jnp.where(ok, b, 0.0))
        m = m + live.astype(m.dtype)  # this step produced a genuine T row
        return (V, alpha, beta, q_next, q, jnp.where(ok, b, 0.0), m, ok)

    V, alpha, beta, _, _, _, m, _ = lax.fori_loop(
        0, k, body,
        (
            V0, alpha0, beta0, q, jax.tree.map(jnp.zeros_like, q),
            jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
            jnp.ones((), bool),
        ),
    )
    return alpha, beta, V, m


def extreme_eigs(
    A,
    v0: Any = None,
    k: int = 32,
    *,
    space: Optional[VectorSpace] = None,
    reorth: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(λ_min, λ_max) Ritz estimates of a symmetric operator.

    Lanczos extremes converge first, so modest k (32) brackets the spectrum;
    with ``k = n`` the values are exact to fp tolerance.  λ_min is
    approached from above and λ_max from below (Ritz values interlace), so
    the implied Chebyshev interval / condition number is *optimistic* — and
    when an extreme is clustered (a Laplacian's λ_min ≈ (jπh)² bottom) the
    small-k Ritz value can overshoot it by orders of magnitude while still
    bracketing.  Take k large enough that the extreme of interest has
    settled (the test suite pins both k=n exactness and the measured k=40
    Laplacian overshoot), or pair with ``chebyshev(lo_frac=...)`` which
    guards exactly this.
    """
    if v0 is None:
        v0 = jax.tree.map(
            lambda l: jnp.cos(jnp.arange(l.size, dtype=l.dtype)).reshape(l.shape),
            A.example_in if hasattr(A, "example_in") else A.u,
        )
    alpha, beta, _, m = lanczos_tridiag(A, v0, k, space=space, reorth=reorth)
    T = jnp.diag(alpha) + jnp.diag(beta[:-1], 1) + jnp.diag(beta[:-1], -1)
    # past breakdown T has zero padding rows whose eigenvalue 0 would
    # pollute the extremes; replace the padding diagonal by T[0,0] (a value
    # already inside the Ritz hull) before the symmetric eig
    idx = jnp.arange(k)
    pad = idx >= m
    T = T + jnp.diag(jnp.where(pad, alpha[0], 0.0))
    evals = jnp.linalg.eigvalsh(T)
    return evals[0], evals[-1]


def arnoldi_hessenberg(
    A,
    v0: Any,
    k: int,
    *,
    space: Optional[VectorSpace] = None,
):
    """k-step Arnoldi factorization A V_k ≈ V_k H + h_{k+1,k} v_{k+1} e_kᵀ.

    Returns ``(H, V)`` with ``H`` of shape (k+1, k) (upper-Hessenberg plus
    the residual row) and ``V`` the stacked (k+1)-row orthonormal basis.
    Orthogonalization is CGS2 (two batched projection passes) — the same
    reduction shape as the GMRES inner loop, one (or two) reductions per
    step instead of j sequential MGS dots.
    """
    space = space or EuclideanSpace()
    q, _ = _normalize(space, v0)
    dtype = space.norm(v0).dtype

    V0 = tree_set_row(tree_stack_like(q, k + 1), 0, q)
    H0 = jnp.zeros((k + 1, k), dtype)

    def body(j, carry):
        V, H = carry
        w = A.mv(tree_get_row(V, j))
        # CGS2: two projection passes against the stacked basis (masked)
        c1 = space.project_rows(V, w)
        w = jax.tree.map(lambda wl, cl: wl - cl, w, tree_basis_combine(V, c1))
        c2 = space.project_rows(V, w)
        w = jax.tree.map(lambda wl, cl: wl - cl, w, tree_basis_combine(V, c2))
        h = c1 + c2
        b = space.norm(w)
        ok = b > 10.0 * jnp.finfo(dtype).eps * jnp.max(jnp.abs(h))
        q_next = tree_scale(jnp.where(ok, 1.0 / jnp.where(b > 0, b, 1.0), 0.0), w)
        H = H.at[:, j].set(h)
        H = H.at[j + 1, j].set(jnp.where(ok, b, 0.0))
        V = lax.cond(
            ok,
            lambda V_: tree_set_row(V_, j + 1, q_next),
            lambda V_: V_,
            V,
        )
        return (V, H)

    V, H = lax.fori_loop(0, k, body, (V0, H0))
    return H, V


def ritz_values(H) -> np.ndarray:
    """Eigenvalues of the leading square Hessenberg block — **host-side**.

    The (k, k) nonsymmetric eig is O(k³) LAPACK work on k ≤ ~100; running
    it on host keeps the device program clean (TPU has no nonsymmetric eig
    anyway).  Call outside jit, on the concrete ``H`` returned by
    :func:`arnoldi_hessenberg`.
    """
    H = np.asarray(H)
    k = H.shape[1]
    Hk = H[:k, :]
    # drop trailing breakdown columns (all-zero) for a clean spectrum
    nz = np.flatnonzero(np.abs(Hk).sum(axis=0) > 0)
    m = int(nz[-1]) + 1 if nz.size else 0
    return np.linalg.eigvals(Hk[:m, :m])


def cond2_estimate(
    A,
    v0: Any = None,
    k: int = 64,
    *,
    space: Optional[VectorSpace] = None,
) -> jnp.ndarray:
    """Matrix-free κ₂(A) = σ_max/σ_min estimate via Lanczos on AᵀA.

    The scalable replacement for the reference's dense
    ``cond(collect(J))`` conditioning studies.  Needs the operator's
    adjoint (``rmv``) — a :class:`~newtonkrylov_tpu.operator.JacobianOperator`
    always has one.  With ``k = n`` exact to fp tolerance; at small k an
    *underestimate* (Ritz extremes interlace), like LAPACK's condition
    estimators.
    """
    example = A.example_in if hasattr(A, "example_in") else A.u
    N = FnOperator(lambda v: A.rmv(A.mv(v)), example)
    if v0 is None:
        v0 = jax.tree.map(
            lambda l: jnp.cos(jnp.arange(l.size, dtype=l.dtype)).reshape(l.shape),
            example,
        )
    lo, hi = extreme_eigs(N, v0, k, space=space)
    return jnp.sqrt(hi / jnp.maximum(lo, jnp.finfo(lo.dtype).tiny))
