"""Inexact Newton–Krylov drivers.

TPU-native rebuild of the reference's only exported API
(``newton_krylov`` / ``newton_krylov!``, ``src/Ariadne.jl:245-372``), with the
same semantics and defaults:

* ``tol = tol_rel·‖F(u₀)‖ + tol_abs`` with ``tol_rel = 1e-6``,
  ``tol_abs = 1e-12`` (src/Ariadne.jl:290-291,306).
* Loop while ``‖F‖ > tol`` and ``outer ≤ max_niter`` (≤ 50,
  src/Ariadne.jl:292,321).
* Per outer iteration: fresh preconditioner factories ``M(J)``/``N(J)``
  (src/Ariadne.jl:323-329), inner ``rtol = η`` from the forcing strategy
  (src/Ariadne.jl:330-333), solve ``J d = F(u)``, step ``u ← u − d`` (no line
  search by default — the reference's explicit TODO, src/Ariadne.jl:341; an
  optional Armijo backtracking globalization is provided beyond parity).
* Blow-up abort when ``‖F‖`` goes NaN/Inf (src/Ariadne.jl:353-356).
* Returns ``(u, NewtonInfo(solved, stats, t))`` with wall-clock ``t``
  (src/Ariadne.jl:370-371).

Two drivers share the same per-iteration mathematics:

:func:`newton_krylov`
    Python-stepped outer loop (the inner step is jit-compiled once and
    reused).  Supports host callbacks (solution traces,
    examples/simple.jl:25-48), host-side preconditioner factories (ILU), and
    leveled verbosity — the reference's interactive semantics.

:func:`newton_krylov_jit`
    The whole solve as one XLA program (``lax.while_loop`` outer loop): zero
    host round-trips, donate-friendly, the production/serving path and the
    unit of multi-chip sharding.  Returns a fixed-length residual-norm
    history in place of per-iteration callbacks.
"""

from __future__ import annotations

import math
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import solvers
from .forcing import EisenstatWalker, Forcing
from .operator import JacobianOperator
from .spaces import EuclideanSpace, VectorSpace
from .tree import tree_axpy, tree_size, tree_sub, tree_where

__all__ = ["Stats", "NewtonInfo", "newton_krylov", "newton_krylov_jit", "NewtonOptions"]


class Stats(NamedTuple):
    """Solve statistics (cf. ``Stats``, src/Ariadne.jl:265-276)."""

    outer_iterations: Any
    inner_iterations: Any
    n_res: Any


class NewtonInfo(NamedTuple):
    """Second return value: ``(; solved, stats, t)`` (src/Ariadne.jl:371)."""

    solved: Any
    stats: Stats
    t: Any
    history: Any = None  # residual-norm trace (jit driver / opt-in)
    floor_limited: Any = False  # df32 path: tol was clamped to the measured
    #   representation floor (floor_rtol); ``solved`` then certifies the
    #   floor-clamped tolerance, the tightest this state encoding can reach


# Krylov.jl's inner GMRES default is NON-restarted: the workspace grows until
# convergence (src/Ariadne.jl:318,338 delegate to Krylov.krylov_workspace /
# krylov_solve! whose gmres has restart=false).  XLA needs a static basis, so
# the drivers default to ONE full cycle of basis size min(n, 100): iteration
# counts match non-restarted GMRES exactly whenever the inner solve converges
# within the basis (in practice always, under inexact-Newton forcing), and
# the solve restarts — rather than aborting — beyond it.  Pass
# ``krylov_kwargs={"restart": ...}`` to override.  See docs/parity.md.
_PARITY_GMRES_BASIS = 100


def _gmres_parity_default(krylov_kwargs: dict, algo: str, example_res) -> None:
    if algo in ("gmres", "fgmres") and "restart" not in krylov_kwargs:
        krylov_kwargs["restart"] = min(tree_size(example_res), _PARITY_GMRES_BASIS)


def _cast_floating(tree, dt):
    """Cast floating-point array leaves to ``dt`` (ints/bools/host scalars
    untouched).  Used on the user params ``p`` when linearizing for a
    low-precision Krylov loop: params like a time-stepper's ``(uₙ, Δt)``
    carry f64 arrays that would otherwise promote the residual — and the
    whole inner loop — back to (emulated) f64."""
    return jax.tree.map(
        lambda l: l.astype(dt)
        if isinstance(l, (jax.Array, np.ndarray)) and jnp.issubdtype(l.dtype, jnp.floating)
        else l,
        tree,
    )


def _linearize_for_inner(F, p, u, res, krylov_dtype, residual_df):
    """(J, b) for the inner solve under the three precision modes shared by
    :func:`newton_krylov_jit` and
    :func:`~newtonkrylov_tpu.continuation.pseudo_transient`:

    * df32 — linearize at the hi word, RHS = carried ``res.hi``, both in
      ``krylov_dtype``; params' float arrays cast down too so they can't
      promote the inner loop back to (emulated) f64;
    * low-precision refinement — state and carried high-precision residual
      cast down;
    * plain — linearize at the state.
    """
    if residual_df is not None:
        u_low = jax.tree.map(lambda l: l.astype(krylov_dtype), u.hi)
        J = JacobianOperator(F, u_low, _cast_floating(p, krylov_dtype))
        b = jax.tree.map(lambda l: l.astype(krylov_dtype), res.hi)
    elif krylov_dtype is not None:
        u_low = jax.tree.map(lambda l: l.astype(krylov_dtype), u)
        J = JacobianOperator(F, u_low, _cast_floating(p, krylov_dtype))
        b = jax.tree.map(lambda l: l.astype(krylov_dtype), res)
    else:
        J = JacobianOperator(F, u, p)
        # use the linearization's free primal, NOT the carried residual:
        # they are the same value, but the carried copy was computed by a
        # differently-fused program and its last-bit differences measurably
        # shift CG counts — host/jit driver count parity pins this choice
        b = J.res
    return J, b


def _resolve_forcing(forcing):
    if forcing is None:
        return None
    if isinstance(forcing, Forcing):
        return forcing
    raise TypeError(f"forcing must be a Forcing or None, got {forcing!r}")


class _HostPrecondSlot:
    """Jit-stable indirection for a host-side preconditioner factory.

    The reference re-invokes preconditioner factories at every outer iteration
    (src/Ariadne.jl:323-329).  A host-side factory (ILU/banded-LU
    factorization) cannot be traced, but its *application* already crosses
    into the compiled Krylov loop via ``pure_callback`` — so the factory is
    the only host-bound piece.  This slot is the fixed apply the jitted step
    traces ONCE; ``refresh`` swaps the factorization it dispatches to, outside
    the jit boundary, each outer iteration.  Result: the Newton step (JVPs,
    inner Krylov loop, update) stays one compiled program even with ILU
    preconditioning, instead of falling back to fully eager stepping.
    """

    def __init__(self, factory):
        self.factory = factory
        self._solve = None  # flat np.ndarray -> np.ndarray, current factorization

    def refresh(self, J: "JacobianOperator") -> None:
        apply = self.factory(J)
        host_solve = getattr(apply, "host_solve", None)
        if host_solve is not None:
            self._solve = host_solve
        else:
            # Generic fallback: run the factory's jax-level apply eagerly on
            # host values (covers user factories marked host_side without a
            # raw host_solve hook).
            _, unravel = jax.flatten_util.ravel_pytree(J.u)

            def eager_solve(flat, _apply=apply, _unravel=unravel):
                out = _apply(_unravel(jnp.asarray(flat)))
                return np.asarray(jax.flatten_util.ravel_pytree(out)[0])

            self._solve = eager_solve

    def _host(self, flat):
        return np.asarray(self._solve(np.asarray(flat)), dtype=flat.dtype)

    def __call__(self, x):
        flat, unravel = jax.flatten_util.ravel_pytree(x)
        out = jax.pure_callback(
            self._host, jax.ShapeDtypeStruct(flat.shape, flat.dtype), flat
        )
        return unravel(out)


def _armijo_step(F, p, space, u, d, res, n_res, sigma=1.0e-4, max_backtracks=8):
    """Backtracking line search on ‖F‖ (globalization beyond the reference's
    fixed s=1, src/Ariadne.jl:341-344).  Halves s until the Armijo condition
    ‖F(u - s d)‖ ≤ (1 - σ s)·‖F(u)‖ holds; falls back to the last s tried."""
    # Unrolled fixed-trip backtracking (jit-safe, max_backtracks is static).
    s = jnp.ones((), n_res.dtype)
    u_new, res_new, n_new = None, None, None
    accepted = jnp.zeros((), bool)
    for _ in range(max_backtracks):
        u_try = tree_axpy(-s, d, u)
        res_try = F(u_try, p)
        n_try = space.norm(res_try)
        ok = (n_try <= (1.0 - sigma * s) * n_res) & jnp.logical_not(accepted)
        if u_new is None:
            u_new, res_new, n_new = u_try, res_try, n_try
        else:
            u_new = tree_where(ok, u_try, u_new)
            res_new = tree_where(ok, res_try, res_new)
            n_new = jnp.where(ok, n_try, n_new)
        accepted = accepted | ok
        s = s * 0.5
    # If never accepted, u_new holds the first (s=1) trial — reference behavior.
    return u_new, res_new, n_new


def newton_krylov(
    F: Callable,
    u0: Any,
    p: Any = None,
    *,
    tol_rel: float = 1.0e-6,
    tol_abs: float = 1.0e-12,
    max_niter: int = 50,
    forcing: Optional[Forcing] = EisenstatWalker(),
    algo: str = "gmres",
    M: Optional[Callable] = None,
    N: Optional[Callable] = None,
    krylov_kwargs: Optional[dict] = None,
    callback: Optional[Callable] = None,
    verbose: int = 0,
    linesearch: Optional[str] = None,
    space: Optional[VectorSpace] = None,
    jit_step: bool = True,
    residual_dtype=None,
    krylov_dtype=None,
    precond_refresh: str = "outer",
    residual_df: Optional[Callable] = None,
    floor_rtol: Optional[float] = 2.0,
):
    """Solve F(u, p) = 0 by inexact Newton–Krylov (reference semantics).

    Arguments mirror ``newton_krylov!`` (src/Ariadne.jl:288-300): ``F`` is the
    *pure* residual ``res = F(u, p)`` (the out-of-place form,
    src/Ariadne.jl:245-248 — in JAX the in-place/out-of-place distinction
    disappears), ``M``/``N`` are left/right preconditioner *factories* called
    with the current :class:`JacobianOperator` each outer iteration, and
    ``callback(u, res, n_res)`` fires after every residual evaluation.
    ``residual_dtype``/``krylov_dtype`` enable mixed-precision refinement and
    ``precond_refresh="once"`` freezes the M/N factories at the u₀ operator,
    as in :func:`newton_krylov_jit`.

    ``residual_df`` is the df32 acceptance path of :func:`newton_krylov_jit`
    brought to THIS driver, so host-side preconditioner factories (ilu0,
    banded_lu — the reference's robustness recipes) compose with the 1e-8
    mixed-precision story: state carried as a df32 pair, inner loop in
    ``krylov_dtype`` (default f32), acceptance residual in double-word
    arithmetic.  Excludes ``residual_dtype``/``linesearch``; the callback
    receives the hi words.  ``floor_rtol`` clamps the tolerance to the
    measured df32 representation floor exactly as in
    :func:`newton_krylov_jit` (``info.floor_limited`` reports it).

    Returns ``(u, NewtonInfo)``.
    """
    space = space or EuclideanSpace()
    forcing = _resolve_forcing(forcing)
    krylov_kwargs = dict(krylov_kwargs or {})
    if precond_refresh not in ("outer", "once"):
        raise ValueError(f"unknown precond_refresh {precond_refresh!r}")

    def _cast(tree, dt):
        return jax.tree.map(lambda l: l.astype(dt), tree)

    if residual_df is not None:
        from . import df32 as _dd

        if residual_dtype is not None or linesearch is not None:
            raise ValueError("residual_df excludes residual_dtype and linesearch")
        if krylov_dtype is None:
            krylov_dtype = jnp.float32
        out_f64 = any(
            jnp.dtype(l.dtype) == jnp.float64 for l in jax.tree.leaves(u0)
        )
        u0 = _dd.df_from_f64(u0)
        outer_res = lambda u: residual_df(u, p)
    elif residual_dtype is not None:
        outer_res = lambda u: F(_cast(u, residual_dtype), p)
    else:
        outer_res = lambda u: F(u, p)

    t0 = time.perf_counter()
    res = outer_res(u0)
    _gmres_parity_default(krylov_kwargs, algo,
                          res.hi if residual_df is not None else res)
    n_res = float(space.norm(res.hi if residual_df is not None else res))
    if callback is not None:
        if residual_df is not None:
            callback(u0.hi, res.hi, n_res)
        else:
            callback(u0, res, n_res)

    tol = tol_rel * n_res + tol_abs
    floor_limited = False
    if residual_df is not None and floor_rtol is not None:
        # one compiled program, not eager op-by-op: on the TPU tunnel each
        # eager dispatch costs ~1 s (utils/profiling.py notes)
        p_low = _cast_floating(p, krylov_dtype)
        floor0 = float(jax.jit(
            lambda uh: _dd.floor_estimate(F, uh, p_low, space=space)
        )(_cast(u0.hi, krylov_dtype)))
        if floor_rtol * floor0 > tol:
            tol = floor_rtol * floor0
            floor_limited = True
    eta = forcing.initial() if forcing is not None else None

    if verbose > 0:
        print(
            f"[newton_krylov] algo={algo} res0={n_res:.6e} tol={tol:.3e} "
            f"(rel={tol_rel} abs={tol_abs}) eta0={eta}"
        )

    # Host-side *factories* (e.g. precond.ilu0: factorization on concrete
    # values) cannot be traced into the jitted step — but their application
    # already crosses via pure_callback, so only the factory invocation must
    # stay outside the jit.  _HostPrecondSlot gives the step a fixed apply to
    # trace once; the slot is refreshed with a concrete JacobianOperator each
    # outer iteration.  Jittable factories (nested_krylov, jacobi,
    # banded_direct, chebyshev) are still invoked inside the step.
    host_M = M is not None and getattr(M, "host_side", False)
    host_N = N is not None and getattr(N, "host_side", False)
    m_slot = _HostPrecondSlot(M) if host_M else None
    n_slot = _HostPrecondSlot(N) if host_N else None
    slots = [s for s in (m_slot, n_slot) if s is not None]

    m_static = n_static = None
    if precond_refresh == "once" and (M is not None or N is not None):
        if residual_df is not None:
            u_for_J0 = _cast(u0.hi, krylov_dtype)
            J0 = JacobianOperator(F, u_for_J0, _cast_floating(p, krylov_dtype))
        else:
            u_for_J0 = _cast(u0, krylov_dtype) if krylov_dtype is not None else u0
            J0 = JacobianOperator(F, u_for_J0, p)
        if slots:  # host factories: factorize once, never refreshed again
            for s in slots:
                s.refresh(J0)
            slots = []
        if M is not None and not host_M:
            m_static = M(J0)
        if N is not None and not host_N:
            n_static = N(J0)

    def step(u, eta_val, rtol_override):
        """One Newton iteration: linearize, inner-solve, update."""
        if residual_df is not None:
            # df32 refined path: linearize at the hi word (f32), RHS = the
            # double-word residual's hi word — same shape as the jit driver.
            u_low = _cast(u.hi, krylov_dtype)
            J = JacobianOperator(F, u_low, _cast_floating(p, krylov_dtype))
            b = _cast(residual_df(u, p).hi, krylov_dtype)
        elif krylov_dtype is not None:
            u_low = _cast(u, krylov_dtype)
            J = JacobianOperator(F, u_low, _cast_floating(p, krylov_dtype))
            b = _cast(outer_res(u), krylov_dtype)
        else:
            J = JacobianOperator(F, u, p)
            b = J.res
        kw = dict(krylov_kwargs)
        kw["space"] = space
        # The outer loop owns the absolute tolerance; a nonzero inner atol
        # (Krylov.jl's √eps default) makes the inner solve exit with 0
        # iterations (d = 0, Newton stall) once ‖F‖ is small — fatal in f32.
        kw.setdefault("atol", 0.0)
        if N is not None:
            kw["N"] = n_slot if host_N else (
                n_static if n_static is not None else N(J))
        if M is not None:
            kw["M"] = m_slot if host_M else (
                m_static if m_static is not None else M(J))
        if forcing is not None:
            kw["rtol"] = rtol_override
        result = solvers.solve(algo, J, b, **kw)
        d = result.x
        if residual_df is not None:
            d32 = _cast(d, jnp.float32)
            u_new = _dd.tree_add_f32(u, jax.tree.map(jnp.negative, d32))
            res_new = residual_df(u_new, p)
            n_new = space.norm(res_new.hi)
            return u_new, res_new, n_new, result.niter
        if krylov_dtype is not None:
            state_dt = jnp.result_type(*[l.dtype for l in jax.tree.leaves(u)])
            d = _cast(d, state_dt)
        if linesearch == "armijo":
            u_new, res_new, n_new = _armijo_step(
                F, p, space, u, d, J.res, space.norm(J.res)
            )
            if residual_dtype is not None:
                res_new = outer_res(u_new)
                n_new = space.norm(res_new)
        else:
            u_new = tree_sub(u, d)  # s = 1 (src/Ariadne.jl:341-344)
            res_new = outer_res(u_new)
            n_new = space.norm(res_new)
        return u_new, res_new, n_new, result.niter

    if jit_step:
        step = jax.jit(step)
    newton_krylov._last_step = step  # test seam: program-count hygiene checks

    u = u0
    stats = Stats(0, 0, n_res)
    solved = n_res <= tol
    while n_res > tol and stats.outer_iterations <= max_niter:
        if slots:
            # Re-factorize on the current linearization point (reference
            # factory semantics) with a CONCRETE operator, outside the jit.
            if residual_df is not None:
                u_for_J = _cast(u.hi, krylov_dtype)
                J_concrete = JacobianOperator(
                    F, u_for_J, _cast_floating(p, krylov_dtype))
            else:
                u_for_J = _cast(u, krylov_dtype) if krylov_dtype is not None else u
                J_concrete = JacobianOperator(F, u_for_J, p)
            for s in slots:
                s.refresh(J_concrete)
        u, res, n_res_dev, niter = step(u, eta, eta if forcing is not None else None)
        n_res_prior = n_res
        n_res = float(n_res_dev)
        niter = int(niter)
        if callback is not None:
            if residual_df is not None:
                callback(u.hi, res.hi, n_res)
            else:
                callback(u, res, n_res)

        if not math.isfinite(n_res):
            # src/Ariadne.jl:353-356
            print(f"[newton_krylov] ERROR: inner solver blew up, stats={stats}")
            break

        if forcing is not None:
            eta = forcing.host_update(eta, tol, n_res, n_res_prior)
            if verbose > 0 and niter == 0:
                print(f"[newton_krylov] inexact Newton accepted step with 0 inner iters, eta={eta}")

        stats = Stats(stats.outer_iterations + 1, stats.inner_iterations + niter, n_res)
        if verbose > 0:
            print(f"[newton_krylov] outer={stats.outer_iterations} |F|={n_res:.6e} eta={eta} inner+={niter}")

    t = time.perf_counter() - t0
    if residual_df is not None:
        u = _dd.df_to_f64(u) if out_f64 else u.hi
    return u, NewtonInfo(solved=n_res <= tol, stats=stats, t=t,
                         floor_limited=floor_limited)


class NewtonOptions(NamedTuple):
    """Static configuration for the jitted driver."""

    tol_rel: float = 1.0e-6
    tol_abs: float = 1.0e-12
    max_niter: int = 50
    algo: str = "gmres"
    linesearch: Optional[str] = None


class _JitCarry(NamedTuple):
    u: Any
    res: Any            # F(u, p) in the state dtype, carried across outers
    n_res: Any
    eta: Any
    outer: Any
    inner: Any
    hist: Any
    blown: Any


def newton_krylov_jit(
    F: Callable,
    u0: Any,
    p: Any = None,
    *,
    tol_rel: float = 1.0e-6,
    tol_abs: float = 1.0e-12,
    max_niter: int = 50,
    forcing: Optional[Forcing] = EisenstatWalker(),
    algo: str = "gmres",
    M: Optional[Callable] = None,
    N: Optional[Callable] = None,
    krylov_kwargs: Optional[dict] = None,
    linesearch: Optional[str] = None,
    space: Optional[VectorSpace] = None,
    residual_dtype=None,
    krylov_dtype=None,
    residual_df: Optional[Callable] = None,
    precond_refresh: str = "outer",
    floor_rtol: Optional[float] = 2.0,
):
    """Whole-solve-in-one-XLA-program Newton–Krylov.

    Same mathematics as :func:`newton_krylov` but the outer loop is a
    ``lax.while_loop``: suitable for jit/pjit/shard_map wrapping, scanning
    over time steps, and the benchmark path.  ``M``/``N`` factories must be
    jittable (e.g. :class:`~newtonkrylov_tpu.precond.NestedKrylov`); host-side
    factories (ILU) need the Python driver.

    Returns ``(u, NewtonInfo)`` where ``history`` is a ``(max_niter+2,)``
    residual-norm trace padded with NaN — the jit-safe replacement for the
    reference's per-iteration callback seam (src/Ariadne.jl:299-304).

    Mixed precision (the TPU answer to fine-stencil f32 floors):

    * ``residual_dtype``: evaluate the *outer-loop* residual norm in a higher
      dtype (typically ``jnp.float64``, software-emulated on TPU) while state
      and inner loop stay in the state dtype.  Removes the residual
      *evaluation* floor; the state representation floor remains.
    * ``krylov_dtype``: full iterative refinement — keep the state (and
      outer residual) in the state dtype (pass ``u0`` in f64) but run the
      linearization and the whole Krylov inner loop in ``krylov_dtype``
      (f32/bf16 on the VPU/MXU).  One high-precision residual per outer
      iteration + cheap low-precision inner matvecs: converges to
      state-dtype floors at near-f32 speed.
    * ``residual_df``: the TPU-native high-precision path — a df32
      (double-float, :mod:`newtonkrylov_tpu.df32`) evaluation of the SAME
      residual, ``residual_df(DF(u), p) -> DF``.  The state is carried as a
      df32 pair, the acceptance residual and its norm run entirely in f32
      VPU ops (no emulated-f64 tensor op anywhere in the loop body — XLA's
      f64 emulation costs 15-80× f32 here, benchmarks/while_anatomy.py),
      and the inner loop takes ``hi`` as its RHS.  Accepts and returns f64
      state at the boundary when ``u0`` is f64.  Requires
      ``krylov_dtype`` (defaulted to f32) and excludes ``residual_dtype``
      and ``linesearch``.

    ``precond_refresh``: ``"outer"`` (default) re-invokes the ``M``/``N``
    factories at every outer iteration on the current linearization point —
    the reference's semantics (src/Ariadne.jl:323-329).  ``"once"`` invokes
    them once on the u₀ operator before the loop: the applies become
    loop-invariant operands XLA hoists out of the ``while_loop`` body.  For
    factories whose output barely tracks the linearization point (the DST
    Poisson preconditioner depends on J only through mean(diag)), this
    removes the per-outer probe + setup cost (measured ~0.6 ms/outer at
    2048², ~14%% of the flagship solve) at an iteration-count cost of ~0.

    ``floor_rtol`` (df32 path only): make convergence at floor-adjacent
    tolerances *deterministic*.  The paired-f32 state resolves ``u`` only
    to ε_dd·|u| ≈ 2⁻⁴⁷·|u|, so ‖F‖ plateaus at the image of that
    granularity under the Jacobian — measured once at solve start by
    :func:`~newtonkrylov_tpu.df32.floor_estimate` (one extra residual
    eval; the probe sits a calibrated ~1.55× above the true plateau).
    The tolerance is clamped to ``max(tol, floor_rtol · floor)`` and
    ``info.floor_limited`` reports whether the clamp engaged; without it,
    a request below the floor burns ``max_niter`` stall outers and
    whether ``solved`` comes back True is a coin flip of the last bit
    (measured at 4096²: tol 9.34e-12 vs plateau 9.13e-12,
    docs/design.md "The df32 floor").  ``None`` disables (reference-exact
    tolerance semantics).  A zero ``u0`` has zero granularity — the probe
    returns 0 and the clamp is a no-op there.
    """
    space = space or EuclideanSpace()
    forcing = _resolve_forcing(forcing)
    krylov_kwargs = dict(krylov_kwargs or {})
    if precond_refresh not in ("outer", "once"):
        raise ValueError(f"unknown precond_refresh {precond_refresh!r}")

    if residual_df is not None:
        from . import df32 as _dd

        if residual_dtype is not None or linesearch is not None:
            raise ValueError(
                "residual_df excludes residual_dtype and linesearch"
            )
        if krylov_dtype is None:
            krylov_dtype = jnp.float32
        if not any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(u0)
        ):
            # Always execute the df32 path as ONE jitted program.  Building
            # it eagerly (standalone while-program compile on XLA:CPU)
            # measurably loses the state's lo word at an f32-eps level that
            # no isolated repro reproduces (benchmarks/while_*.py hunt);
            # under a single jit the path is bit-stable and verified against
            # the f64 oracle (tests/test_df32.py).  Re-traces per eager
            # call; hot callers should jit the enclosing computation.
            return jax.jit(
                lambda u0_: newton_krylov_jit(
                    F, u0_, p, tol_rel=tol_rel, tol_abs=tol_abs,
                    max_niter=max_niter, forcing=forcing, algo=algo, M=M,
                    N=N, krylov_kwargs=krylov_kwargs, linesearch=linesearch,
                    space=space, residual_dtype=residual_dtype,
                    krylov_dtype=krylov_dtype, residual_df=residual_df,
                    precond_refresh=precond_refresh, floor_rtol=floor_rtol,
                )
            )(u0)
        out_f64 = any(
            jnp.dtype(l.dtype) == jnp.float64 for l in jax.tree.leaves(u0)
        )

    if residual_dtype is not None:
        def outer_norm(u):
            uh = jax.tree.map(lambda l: l.astype(residual_dtype), u)
            return space.norm(F(uh, p))
    else:
        def outer_norm(u):
            return space.norm(F(u, p))

    if residual_df is not None:
        u0 = _dd.df_from_f64(u0)
        res0 = residual_df(u0, p)
        _gmres_parity_default(krylov_kwargs, algo, res0.hi)
        n_res0 = space.norm(res0.hi)
    else:
        res0 = F(u0, p)
        _gmres_parity_default(krylov_kwargs, algo, res0)
        n_res0 = outer_norm(u0)
    dtype = n_res0.dtype
    tol = tol_rel * n_res0 + tol_abs
    floor_limited = jnp.zeros((), bool)
    if residual_df is not None and floor_rtol is not None:
        u_low0 = jax.tree.map(lambda l: l.astype(krylov_dtype), u0.hi)
        floor0 = _dd.floor_estimate(
            F, u_low0, _cast_floating(p, krylov_dtype), space=space
        )
        tol_clamped = jnp.maximum(tol, jnp.asarray(floor_rtol, dtype) * floor0)
        floor_limited = tol_clamped > tol
        tol = tol_clamped
    eta0 = jnp.asarray(forcing.initial() if forcing is not None else 0.0, dtype)

    hist0 = jnp.full((max_niter + 2,), jnp.nan, dtype).at[0].set(n_res0)

    m_static = n_static = None
    if precond_refresh == "once" and (M is not None or N is not None):
        # Build the preconditioner applies on the u0 operator, OUTSIDE the
        # while body: their arrays become loop-invariant operands.
        if residual_df is not None:
            u_low0 = jax.tree.map(lambda l: l.astype(krylov_dtype), u0.hi)
            J0 = JacobianOperator(F, u_low0, _cast_floating(p, krylov_dtype))
        elif krylov_dtype is not None:
            u_low0 = jax.tree.map(lambda l: l.astype(krylov_dtype), u0)
            J0 = JacobianOperator(F, u_low0, _cast_floating(p, krylov_dtype))
        else:
            J0 = JacobianOperator(F, u0, p)
        m_static = M(J0) if M is not None else None
        n_static = N(J0) if N is not None else None

    def cond(c: _JitCarry):
        return (c.n_res > tol) & (c.outer <= max_niter) & jnp.logical_not(c.blown)

    def body(c: _JitCarry):
        # The high-precision residual is CARRIED from the previous outer's
        # acceptance eval instead of re-evaluated — one high-precision
        # residual per outer, not two.
        J, b = _linearize_for_inner(F, p, c.u, c.res, krylov_dtype, residual_df)
        kw = dict(krylov_kwargs)
        kw["space"] = space
        kw.setdefault("atol", 0.0)  # outer loop owns absolute tolerance
        if N is not None:
            kw["N"] = n_static if n_static is not None else N(J)
        if M is not None:
            kw["M"] = m_static if m_static is not None else M(J)
        if forcing is not None:
            kw["rtol"] = c.eta.astype(jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)]))
        result = solvers.solve(algo, J, b, **kw)
        if residual_df is not None:
            d32 = jax.tree.map(lambda l: l.astype(jnp.float32), result.x)
            u_new = _dd.tree_add_f32(c.u, jax.tree.map(jnp.negative, d32))
            res_new = residual_df(u_new, p)
            n_new = space.norm(res_new.hi)
            blown = jnp.logical_not(jnp.isfinite(n_new))
            eta_new = (
                forcing(c.eta, tol, n_new, c.n_res)
                if forcing is not None else c.eta
            )
            hist = c.hist.at[c.outer + 1].set(n_new)
            return _JitCarry(
                u_new, res_new, n_new, eta_new, c.outer + 1,
                c.inner + result.niter, hist, blown,
            )
        if krylov_dtype is not None:
            state_dt = jnp.result_type(*[l.dtype for l in jax.tree.leaves(c.u)])
            d = jax.tree.map(lambda l: l.astype(state_dt), result.x)
        else:
            d = result.x

        if linesearch == "armijo":
            u_new, res_new, n_new = _armijo_step(F, p, space, c.u, d, J.res, c.n_res)
            if residual_dtype is not None:
                n_new = outer_norm(u_new)
        else:
            u_new = tree_sub(c.u, d)
            res_new = F(u_new, p)
            if residual_dtype is not None:
                n_new = outer_norm(u_new)
            else:
                n_new = space.norm(res_new)

        blown = jnp.logical_not(jnp.isfinite(n_new))
        eta_new = (
            forcing(c.eta, tol, n_new, c.n_res) if forcing is not None else c.eta
        )
        hist = c.hist.at[c.outer + 1].set(n_new)
        return _JitCarry(
            u_new, res_new, n_new, eta_new, c.outer + 1, c.inner + result.niter,
            hist, blown,
        )

    init = _JitCarry(
        u0, res0, n_res0, eta0,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        hist0, jnp.zeros((), bool),
    )
    fin = lax.while_loop(cond, body, init)

    stats = Stats(fin.outer, fin.inner, fin.n_res)
    info = NewtonInfo(
        solved=(fin.n_res <= tol) & jnp.logical_not(fin.blown),
        stats=stats,
        t=jnp.zeros((), dtype),  # wall-clock is a host concept; time outside jit
        history=fin.hist,
        floor_limited=floor_limited,
    )
    if residual_df is not None:
        u_out = _dd.df_to_f64(fin.u) if out_f64 else fin.u.hi
        return u_out, info
    return fin.u, info
