"""Implicit time integration: residual-builder steppers + marching drivers.

TPU-native rebuild of the reference's L4 layer (``examples/implicit.jl``):
an ODE right-hand side ``f(u, p, t) -> du`` is turned into a per-step root
problem ``G(u) = 0`` solved by Newton–Krylov, with three single-step schemes
(``G_Euler!``/``G_Midpoint!``/``G_Trapezoid!``, examples/implicit.jl:8-37)
and a fixed-step marching driver (``solve``, examples/implicit.jl:54-78).

Time-argument convention: the reference's ``solve`` passes the *target* time
``t = t_{n+1}`` of each step into ``G!`` (examples/implicit.jl:63-70), so its
midpoint scheme evaluates ``f`` at ``t + αΔt`` — i.e. past the step — and its
trapezoid scheme evaluates the *old* state at the *new* time
(examples/implicit.jl:17-37).  We reproduce those exact formulas for parity
(all reference problems are autonomous, so this is behaviorally invisible);
the docstrings note where the standard scheme would differ.

Two marching drivers share the steppers:

:func:`integrate`
    Host loop, one :func:`~newtonkrylov_tpu.newton.newton_krylov` per step
    with the reference's ``tol_abs = 6e-6`` (examples/implicit.jl:69) and
    warn-and-continue on failure (examples/implicit.jl:71-73); supports
    per-step host callbacks (video frames, examples/heat_2D.jl:123-132).

:func:`integrate_scan`
    The whole march as one XLA program: ``lax.scan`` over steps, each step a
    jitted Newton solve — the production/serving path; returns the stacked
    state history and per-step stats instead of callbacks.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .forcing import EisenstatWalker, Forcing
from .newton import newton_krylov, newton_krylov_jit
from .spaces import VectorSpace
from .tree import tree_axpby, tree_axpy, tree_scale, tree_sub

__all__ = [
    "StepParams",
    "implicit_euler",
    "implicit_euler_df",
    "implicit_midpoint",
    "implicit_trapezoid",
    "step_jacobian",
    "integrate",
    "integrate_scan",
    "STEPPERS",
]


class StepParams(NamedTuple):
    """Per-step parameters threaded through the step residual.

    The functional analogue of the reference's ``(uₙ, Δt, du, p, t)`` tuple
    (examples/implicit.jl:61) — no scratch ``du`` is needed in a pure design.
    """

    un: Any          # state at start of step
    dt: Any          # step size
    p: Any           # user parameters for f
    t: Any           # the step's *target* time t_{n+1} (reference convention)


def implicit_euler(f: Callable) -> Callable:
    """Backward Euler: ``G(u) = uₙ + Δt·f(u, t) − u`` (examples/implicit.jl:8-13).

    ``f`` is evaluated at the target time (implicit in the new state).
    """

    def G(u, sp: StepParams):
        du = f(u, sp.p, sp.t)
        return tree_sub(tree_axpy(sp.dt, du, sp.un), u)

    return G


def implicit_midpoint(f: Callable, alpha: float = 0.5) -> Callable:
    """Implicit midpoint: ``G(u) = uₙ + Δt·f(αuₙ + (1−α)u, t + αΔt) − u``
    (examples/implicit.jl:17-25).

    Note the reference evaluates at ``t + αΔt`` where ``t`` is already the
    target time — reproduced verbatim (harmless for autonomous systems).
    """

    def G(u, sp: StepParams):
        u_mid = tree_axpby(alpha, sp.un, 1.0 - alpha, u)
        du = f(u_mid, sp.p, sp.t + alpha * sp.dt)
        return tree_sub(tree_axpy(sp.dt, du, sp.un), u)

    return G


def implicit_trapezoid(f: Callable) -> Callable:
    """Implicit trapezoid: ``G(u) = uₙ + Δt/2·(f(uₙ, t) + f(u, t + Δt)) − u``
    (examples/implicit.jl:29-37; the reference's time arguments, kept)."""

    def G(u, sp: StepParams):
        dun = f(sp.un, sp.p, sp.t)
        du = f(u, sp.p, sp.t + sp.dt)
        fsum = jax.tree.map(jnp.add, dun, du)
        return tree_sub(tree_axpy(0.5 * sp.dt, fsum, sp.un), u)

    return G


def implicit_euler_df(f_df: Callable) -> Callable:
    """df32 backward-Euler residual: ``G(u) = uₙ + Δt·f(u, t) − u`` with
    ``u`` a :class:`~newtonkrylov_tpu.df32.DF` pair and ``f_df`` the
    problem's df32 RHS (e.g. :func:`~newtonkrylov_tpu.problems.heat2d.rhs_df`).

    Pass alongside the plain stepper as the refined driver's acceptance
    residual::

        integrate("euler", heat2d.rhs, u0, p, dt, T,
                  newton_kwargs=dict(residual_df=implicit_euler_df(heat2d.rhs_df)))

    ``Δt`` and ``uₙ`` enter as df32 splits of their (possibly f64) values, so
    the step residual keeps ~2⁻⁴⁸ relative accuracy end to end on a TPU with
    no emulated-f64 op in the loop.
    """
    from . import df32 as dd

    def G(u, sp: StepParams):
        du = f_df(u, sp.p, sp.t)
        dt_df = dd.df_from_f64(jnp.asarray(sp.dt))
        un_df = dd.df_from_f64(sp.un)
        s = dd.add(un_df, dd.mul(du, dt_df))
        return dd.add(s, dd.neg(u))

    return G


STEPPERS = {
    "euler": implicit_euler,
    "midpoint": implicit_midpoint,
    "trapezoid": implicit_trapezoid,
}


def step_jacobian(stepper: Callable, f: Callable, un, p, dt, t=0.0):
    """Dense Jacobian of one implicit step at u = uₙ — the analysis probe of
    ``jacobian(G!, f!, ...)`` (examples/implicit.jl:41-50), used for
    rank/condition studies (examples/heat_1D.jl:55-93)."""
    from .operator import JacobianOperator, materialize_dense

    if isinstance(stepper, str):
        stepper = STEPPERS[stepper]
    G = stepper(f)
    sp = StepParams(un=un, dt=dt, p=p, t=t)
    J = JacobianOperator(G, un, sp)
    return materialize_dense(J)


class MarchResult(NamedTuple):
    u: Any                 # final state
    history: Any           # stacked states (n_saved, ...) or None
    ts: Any                # times corresponding to history
    n_failed: Any          # steps whose nonlinear solve did not converge
    outer_iterations: Any  # per-step Newton outer counts
    inner_iterations: Any  # per-step Krylov totals


def integrate(
    stepper,
    f: Callable,
    u0: Any,
    p: Any,
    dt: float,
    t_final: float,
    *,
    t0: float = 0.0,
    callback: Optional[Callable] = None,
    save_history: bool = False,
    tol_abs: float = 6.0e-6,
    newton_kwargs: Optional[dict] = None,
    verbose: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> MarchResult:
    """Fixed-step implicit time marching (host loop).

    Mirrors ``solve(G!, f!, uₙ, p, Δt, ts)`` (examples/implicit.jl:54-78):
    per step one Newton solve with ``tol_abs`` defaulting to the reference's
    6e-6 (examples/implicit.jl:69), warn-and-continue on a failed solve, and
    a ``callback(u)`` fired after every accepted step.

    ``stepper`` is one of the builders above (or a string key of STEPPERS).

    Checkpoint/resume (absent in the reference — SURVEY.md §5): with
    ``checkpoint_dir`` set and ``checkpoint_every > 0`` a snapshot of
    ``(u, t, step)`` is written every that-many steps; ``resume=True``
    restarts the march from the latest snapshot in the directory.
    """
    if isinstance(stepper, str):
        stepper = STEPPERS[stepper]
    G = stepper(f)
    newton_kwargs = dict(newton_kwargs or {})
    newton_kwargs.setdefault("tol_abs", tol_abs)

    # One compile per march: unless host-only options force the Python-stepped
    # Newton driver, each step reuses a single jitted whole-solve program.
    host_only = (
        verbose > 0
        or "callback" in newton_kwargs
        or "jit_step" in newton_kwargs
        or any(
            getattr(newton_kwargs.get(key), "host_side", False)
            for key in ("M", "N")
        )
    )

    if not host_only:
        @jax.jit
        def solve_step(un, t):
            sp = StepParams(un=un, dt=dt, p=p, t=t)
            return newton_krylov_jit(G, un, sp, **newton_kwargs)

    n_steps = int(round((t_final - t0) / dt))
    u = u0
    un = u0
    start_step = 0
    if resume and checkpoint_dir:
        from .utils.checkpointing import latest_checkpoint, load_checkpoint

        latest = latest_checkpoint(checkpoint_dir)
        if latest is not None:
            ck = load_checkpoint(latest, u0)
            un = u = ck.u
            start_step = ck.step
            if verbose > 0:
                print(f"[integrate] resumed from {latest} (step {start_step}, t={ck.t})")

    hist = [un] if save_history else None
    ts = [t0 + start_step * dt]
    n_failed = 0
    outers, inners = [], []

    for k in range(start_step + 1, n_steps + 1):
        t = t0 + k * dt
        if host_only:
            sp = StepParams(un=un, dt=dt, p=p, t=t)
            u, info = newton_krylov(G, un, sp, verbose=verbose, **newton_kwargs)
        else:
            u, info = solve_step(un, t)
        if not bool(info.solved):
            n_failed += 1
            print(f"[integrate] WARNING: nonlinear solve failed, marching on (t={t}, stats={info.stats})")
        if callback is not None:
            callback(u)
        if save_history:
            hist.append(u)
        ts.append(t)
        outers.append(int(info.stats.outer_iterations))
        inners.append(int(info.stats.inner_iterations))
        un = u
        if checkpoint_dir and checkpoint_every and k % checkpoint_every == 0:
            from .utils.checkpointing import MarchCheckpoint, save_checkpoint

            save_checkpoint(
                f"{checkpoint_dir}/march_{k}",
                MarchCheckpoint(u=u, t=t, step=k, extra={"dt": dt}),
            )

    history = jax.tree.map(lambda *ls: jnp.stack(ls), *hist) if save_history else None
    return MarchResult(
        u=u,
        history=history,
        ts=jnp.asarray(ts),
        n_failed=n_failed,
        outer_iterations=jnp.asarray(outers),
        inner_iterations=jnp.asarray(inners),
    )


def integrate_scan(
    stepper,
    f: Callable,
    u0: Any,
    p: Any,
    dt: float,
    n_steps: int,
    *,
    t0: float = 0.0,
    save_every: int = 1,
    tol_abs: float = 6.0e-6,
    newton_kwargs: Optional[dict] = None,
) -> MarchResult:
    """Whole time march as one XLA program (``lax.scan`` over jitted Newton
    solves) — the TPU production path the reference has no analogue for.

    Returns stacked history every ``save_every`` steps plus per-step Newton
    stats (the jit-safe replacement for the reference's per-step callback).
    """
    if isinstance(stepper, str):
        stepper = STEPPERS[stepper]
    G = stepper(f)
    newton_kwargs = dict(newton_kwargs or {})
    newton_kwargs.setdefault("tol_abs", tol_abs)

    fdtype = jnp.result_type(float)

    def one_step(un, k):
        # k is int32: exact far beyond 2^24, unlike a float step counter
        t = t0 + (k + 1).astype(fdtype) * dt
        sp = StepParams(un=un, dt=dt, p=p, t=t)
        u, info = newton_krylov_jit(G, un, sp, **newton_kwargs)
        return u, (u, info.solved, info.stats.outer_iterations, info.stats.inner_iterations)

    ks = jnp.arange(n_steps, dtype=jnp.int32)
    u_fin, (us, solved, outers, inners) = lax.scan(one_step, u0, ks)

    if save_every > 1:
        us = jax.tree.map(lambda l: l[save_every - 1 :: save_every], us)
        ts = t0 + dt * (jnp.arange(1, n_steps + 1)[save_every - 1 :: save_every])
    else:
        ts = t0 + dt * jnp.arange(1, n_steps + 1)

    return MarchResult(
        u=u_fin,
        history=us,
        ts=ts,
        n_failed=jnp.sum(jnp.logical_not(solved)),
        outer_iterations=outers,
        inner_iterations=inners,
    )
