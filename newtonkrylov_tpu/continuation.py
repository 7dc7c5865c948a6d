"""Pseudo-transient continuation (PTC): globalized JFNK for hard problems.

The reference steps full Newton with a fixed s = 1 and leaves globalization
as an explicit TODO (``src/Ariadne.jl:341-344``); its failure mode is
documented, not prevented (divergent recipes in ``examples/bratu.jl:110-118``,
blow-up abort ``src/Ariadne.jl:353-356``).  This module supplies the standard
JFNK globalization from the reference's own citation base — Kelley 2003
(``docs/src/refs.bib``, the book behind ``examples/simple.jl``) Chapter on
``ptcsol``, and Kelley & Keyes, *Convergence analysis of pseudo-transient
continuation*, SINUM 35(2), 1998:

solve the steady state of ``du/dτ = −F(u)`` by backward-Euler pseudo-time
steps whose linear system is solved by the same matrix-free Krylov machinery
as the Newton driver:

    (δₖ⁻¹ I + F′(uₖ)) d = F(uₖ),      uₖ₊₁ = uₖ − d,

with the pseudo-timestep grown by **switched evolution relaxation** (SER):

    δₖ₊₁ = min(δ_max, δₖ · ‖F(uₖ)‖ / ‖F(uₖ₊₁)‖).

Far from the solution δ is small and the iteration follows the (globally
attracting) pseudo-time flow; near it δ → δ_max and the step is an inexact
Newton step, recovering local superlinear convergence.  The whole solve is
one XLA program (``lax.while_loop``), exactly like
:func:`~newtonkrylov_tpu.newton.newton_krylov_jit`, and composes with the
same spaces (Masked/Sharded), jittable preconditioner factories (which see
the shifted diagonal automatically — they probe through
:class:`~newtonkrylov_tpu.operator.ShiftedOperator.mv`), and the f32 Krylov
loop.

TPU notes: the shift adds one fused axpy per matvec (bandwidth-free next to
the stencil JVP), and because δ is a traced scalar the *same* compiled
program serves every step — no recompile as δ grows.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import solvers
from .forcing import Fixed, Forcing
from .newton import (
    NewtonInfo,
    Stats,
    _linearize_for_inner,
    _resolve_forcing,
)
from .operator import ShiftedOperator
from .spaces import EuclideanSpace, VectorSpace
from .tree import tree_sub

__all__ = ["pseudo_transient"]


class _PTCCarry(NamedTuple):
    u: Any
    res: Any
    n_res: Any
    delta: Any
    eta: Any
    outer: Any
    inner: Any
    hist: Any
    blown: Any


def pseudo_transient(
    F: Callable,
    u0: Any,
    p: Any = None,
    *,
    delta0: float = 1.0,
    delta_max: float = 1.0e12,
    tol_rel: float = 1.0e-6,
    tol_abs: float = 1.0e-12,
    max_steps: int = 200,
    forcing: Optional[Forcing] = Fixed(1.0e-2),
    algo: str = "gmres",
    M: Optional[Callable] = None,
    N: Optional[Callable] = None,
    krylov_kwargs: Optional[dict] = None,
    space: Optional[VectorSpace] = None,
    krylov_dtype=None,
    residual_df: Optional[Callable] = None,
    floor_rtol: Optional[float] = 2.0,
):
    """Solve F(u, p) = 0 by Ψtc (pseudo-transient continuation) + SER.

    Use when plain Newton from the available initial guess diverges — e.g.
    ``F(x) = arctan(x)`` from ``|x₀| ≳ 1.4``, or steady states whose Newton
    basin is tiny (ignition problems near the Bratu fold).  Near the root it
    *is* inexact Newton (δ → ``delta_max``), so the convergence tolerance
    semantics match the Newton drivers exactly:
    ``tol = tol_rel·‖F(u₀)‖ + tol_abs``.

    Two usage facts that do not exist for plain Newton (both are inherent to
    Ψtc, cf. Kelley & Keyes' stability hypothesis, not quirks of this
    implementation):

    * **Sign convention.**  Ψtc follows the flow ``du/dτ = −F(u)`` and
      converges to steady states that are *stable* for that flow.  Newton is
      sign-blind; Ψtc is not.  For the Bratu residual written as
      ``Δu + λeᵘ`` the stable heat flow is ``du/dτ = Δu + λeᵘ``, so pass
      ``−residual`` (tests/test_continuation.py pins both the convergent
      sign and the stall of the wrong one).  Starts in the flow's blow-up
      basin (e.g. Bratu data above the unstable branch) genuinely blow up —
      the NaN/Inf abort reports ``solved=False``, matching the reference's
      blow-up semantics (src/Ariadne.jl:353-356).
    * **δ₀ matches the residual's time unit.**  A dx²-scaled PDE residual
      evolves in dx²-scaled pseudo-time: take ``delta0 ≈ 1/dx²`` (5 outer
      steps on 2-D Bratu 32² at λ=6; δ₀=1 needs ~10³ because SER grows δ
      only as fast as the residual falls).

    Parameters mirror :func:`~newtonkrylov_tpu.newton.newton_krylov_jit`
    where shared.  Three Newton-driver options are deliberately absent:
    ``linesearch`` (Ψtc *is* the globalization), ``residual_dtype``
    (superseded by ``residual_df``), and ``precond_refresh="once"`` (the
    preconditioned operator δ⁻¹I + J changes with δ every step, so a
    factory frozen at δ₀ bakes in a stale shift — refresh-per-step is the
    correct semantics here).  PTC-specific:

    delta0
        Initial pseudo-timestep.  Small = cautious (closer to explicit
        pseudo-time marching; SER then needs many steps to grow out of it —
        ``arctan`` from x₀=3 takes 6 steps at δ₀=1 but ~10³ at δ₀=0.01);
        large = aggressive (closer to plain Newton, with its divergence
        risk).  1.0 balances the two for O(1)-scaled residuals.
    delta_max
        Cap on the SER growth.  At ``δ = delta_max`` the shift ``1/δ`` is
        negligible and steps are Newton steps.
    max_steps
        Inclusive bound, deliberately matching the Newton drivers'
        ``max_niter`` convention (the reference loops while
        ``outer ≤ max_niter``, src/Ariadne.jl:292,321): up to
        ``max_steps + 1`` pseudo-time steps run, and
        ``stats.outer_iterations`` can read ``max_steps + 1`` on a solve
        that exhausts the budget.  Size history buffers accordingly
        (``info.history`` already is).
    forcing
        Inner tolerance strategy; ``Fixed(1e-2)`` by default (Kelley's
        ``ptcsol`` default regime — Eisenstat–Walker's history-based η is
        meaningful only once the iteration is in the Newton regime, but is
        accepted here too and is safe: its safeguard keeps η ≤ η_max).
    M, N
        Jittable preconditioner *factories*, invoked per step on the
        **shifted** operator ``δ⁻¹I + J`` — probing factories (fft_poisson,
        adi, jacobi) absorb the diagonal shift automatically, which is
        exactly what Ψtc preconditioning wants.
    residual_df
        The df32 acceptance-residual path of
        :func:`~newtonkrylov_tpu.newton.newton_krylov_jit`, identically:
        state carried as a paired-f32 DF, inner loop in ``krylov_dtype``
        (defaulted f32), acceptance residual/norm in double-word VPU
        arithmetic, f64 in/out at the boundary — Ψtc at 1e-8 on TPU with
        no emulated-f64 op in the loop.  ``floor_rtol`` clamps the
        tolerance to the measured df32 representation floor exactly as in
        the Newton drivers (``info.floor_limited`` reports it).

    Returns ``(u, NewtonInfo)``; ``info.history`` is the padded
    ``‖F‖``-trace, ``info.stats.outer_iterations`` the number of pseudo-time
    steps taken.
    """
    space = space or EuclideanSpace()
    krylov_kwargs = dict(krylov_kwargs or {})
    forcing = _resolve_forcing(forcing)

    from .newton import _gmres_parity_default

    if residual_df is not None:
        # df32 acceptance path, mirroring newton_krylov_jit: the state is a
        # DF pair, the acceptance residual/norm run in paired-f32 VPU ops,
        # and the inner loop takes the hi word as its RHS.  Same
        # one-jitted-program rule as the Newton driver (df32.py warning).
        from . import df32 as _dd

        if krylov_dtype is None:
            krylov_dtype = jnp.float32
        if not any(isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(u0)):
            return jax.jit(
                lambda u0_: pseudo_transient(
                    F, u0_, p, delta0=delta0, delta_max=delta_max,
                    tol_rel=tol_rel, tol_abs=tol_abs, max_steps=max_steps,
                    forcing=forcing, algo=algo, M=M, N=N,
                    krylov_kwargs=krylov_kwargs, space=space,
                    krylov_dtype=krylov_dtype, residual_df=residual_df,
                    floor_rtol=floor_rtol,
                )
            )(u0)
        out_f64 = any(
            jnp.dtype(l.dtype) == jnp.float64 for l in jax.tree.leaves(u0)
        )
        u0 = _dd.df_from_f64(u0)
        res0 = residual_df(u0, p)
        _gmres_parity_default(krylov_kwargs, algo, res0.hi)
        n_res0 = space.norm(res0.hi)
    else:
        res0 = F(u0, p)
        _gmres_parity_default(krylov_kwargs, algo, res0)
        n_res0 = space.norm(res0)
    dtype = n_res0.dtype
    tol = tol_rel * n_res0 + tol_abs
    floor_limited = jnp.zeros((), bool)
    if residual_df is not None and floor_rtol is not None:
        from .newton import _cast_floating

        u_low0 = jax.tree.map(lambda l: l.astype(krylov_dtype), u0.hi)
        floor0 = _dd.floor_estimate(
            F, u_low0, _cast_floating(p, krylov_dtype), space=space
        )
        tol_clamped = jnp.maximum(tol, jnp.asarray(floor_rtol, dtype) * floor0)
        floor_limited = tol_clamped > tol
        tol = tol_clamped
    eta0 = jnp.asarray(forcing.initial() if forcing is not None else 0.0, dtype)
    delta0_ = jnp.asarray(delta0, dtype)
    hist0 = jnp.full((max_steps + 2,), jnp.nan, dtype).at[0].set(n_res0)

    def cond(c: _PTCCarry):
        return (c.n_res > tol) & (c.outer <= max_steps) & jnp.logical_not(c.blown)

    def body(c: _PTCCarry):
        J, b = _linearize_for_inner(F, p, c.u, c.res, krylov_dtype, residual_df)
        A = ShiftedOperator(J, 1.0 / c.delta)
        kw = dict(krylov_kwargs)
        kw["space"] = space
        kw.setdefault("atol", 0.0)
        if N is not None:
            kw["N"] = N(A)
        if M is not None:
            kw["M"] = M(A)
        if forcing is not None:
            kw["rtol"] = c.eta.astype(
                jnp.result_type(*[l.dtype for l in jax.tree.leaves(b)])
            )
        result = solvers.solve(algo, A, b, **kw)
        if residual_df is not None:
            d32 = jax.tree.map(lambda l: l.astype(jnp.float32), result.x)
            u_new = _dd.tree_add_f32(c.u, jax.tree.map(jnp.negative, d32))
            res_new = residual_df(u_new, p)
            n_new = space.norm(res_new.hi)
        else:
            if krylov_dtype is not None:
                state_dt = jnp.result_type(*[l.dtype for l in jax.tree.leaves(c.u)])
                d = jax.tree.map(lambda l: l.astype(state_dt), result.x)
            else:
                d = result.x
            u_new = tree_sub(c.u, d)
            res_new = F(u_new, p)
            n_new = space.norm(res_new)
        blown = jnp.logical_not(jnp.isfinite(n_new))
        # SER: grow δ by the residual-reduction ratio; a *bad* step (n_new >
        # n_res) shrinks δ by the same rule, automatically backing toward the
        # pseudo-time flow — Ψtc's built-in recovery.
        delta_new = jnp.minimum(
            jnp.asarray(delta_max, dtype), c.delta * c.n_res / jnp.maximum(n_new, jnp.finfo(dtype).tiny)
        )
        eta_new = (
            forcing(c.eta, tol, n_new, c.n_res) if forcing is not None else c.eta
        )
        hist = c.hist.at[c.outer + 1].set(n_new)
        return _PTCCarry(
            u_new, res_new, n_new, delta_new, eta_new,
            c.outer + 1, c.inner + result.niter, hist, blown,
        )

    init = _PTCCarry(
        u0, res0, n_res0, delta0_, eta0,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        hist0, jnp.zeros((), bool),
    )
    fin = lax.while_loop(cond, body, init)

    stats = Stats(fin.outer, fin.inner, fin.n_res)
    info = NewtonInfo(
        solved=(fin.n_res <= tol) & jnp.logical_not(fin.blown),
        stats=stats,
        t=jnp.zeros((), dtype),
        history=fin.hist,
        floor_limited=floor_limited,
    )
    if residual_df is not None:
        u_out = _dd.df_to_f64(fin.u) if out_f64 else fin.u.hi
        return u_out, info
    return fin.u, info
