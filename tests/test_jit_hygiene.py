"""Host-factory jit hygiene (VERDICT r2 weak #7).

A host-side preconditioner factory (ILU/banded-LU factorization on concrete
values) must not demote the Newton step to fully eager stepping: the
factorization is the only host-bound piece — its application already crosses
into the compiled Krylov loop via ``pure_callback``.  ``newton_krylov`` now
invokes host factories on a concrete operator OUTSIDE the jitted step and
routes the apply through a fixed ``_HostPrecondSlot`` the step traces once.

Checks are program-count based (timing-insensitive): the jitted step's
compilation-cache size must be 1 after a multi-outer solve, and the slot must
have been refreshed once per outer iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import newton_krylov, precond
from newtonkrylov_tpu.newton import _HostPrecondSlot
from newtonkrylov_tpu.problems import bratu1d


def _solve_ilu(n=512, **kw):
    # n=512: same config as TestBratu1D.test_gmres_ilu0_host_preconditioner.
    # (Smaller grids sit too close to the discrete critical λ* ≈ 3.513830 —
    # the Jacobian is near-singular at the solution and even EXACT Newton
    # stalls around ‖F‖ ≈ 1e-3; verified against a dense-solve oracle.)
    p = bratu1d.default_config(n)
    u0 = bratu1d.initial_guess(n)
    return newton_krylov(
        bratu1d.residual, u0, p, algo="gmres", N=precond.ilu0(bandwidth=1), **kw
    )


def test_ilu_step_is_jitted_and_traces_once():
    _, info = _solve_ilu()
    assert info.solved
    assert info.stats.outer_iterations >= 2  # multi-outer, else vacuous
    step = newton_krylov._last_step
    # the step survived as a jitted function (pre-fix: plain Python function)
    assert hasattr(step, "lower"), "step was not jitted with a host factory"
    assert step._cache_size() == 1, (
        f"step retraced {step._cache_size()} times — host factory leaked "
        "into the traced program"
    )


def test_ilu_factory_refreshed_per_outer():
    """Reference semantics: factories track the linearization point — the
    factorization must be rebuilt every outer iteration
    (src/Ariadne.jl:323-329), even though the step compiles once."""
    calls = []
    base = precond.ilu0(bandwidth=1)

    def counting_factory(J):
        calls.append(1)
        return base(J)

    counting_factory.host_side = True

    n = 512
    p = bratu1d.default_config(n)
    u0 = bratu1d.initial_guess(n)
    _, info = newton_krylov(
        bratu1d.residual, u0, p, algo="gmres", N=counting_factory
    )
    assert info.solved
    assert len(calls) == int(info.stats.outer_iterations)
    assert newton_krylov._last_step._cache_size() == 1


def test_ilu_converges_same_as_before():
    """The hygiene change must not alter the mathematics: same iteration
    counts and solution as the reference ILU recipe test."""
    u, info = _solve_ilu()
    assert info.solved
    assert info.stats.inner_iterations <= 3 * info.stats.outer_iterations
    # near-critical λ amplifies discretization error: ~1.2e-3 at n=512
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(bratu1d.true_solution(bratu1d.grid(512))),
        atol=2e-3,
    )


def test_slot_fallback_without_host_solve_hook():
    """User factories marked host_side whose apply has no raw host_solve hook
    go through the slot's eager-apply fallback."""

    def factory(J):
        offsets, diags = None, None
        from newtonkrylov_tpu.operator import materialize_banded

        offsets, diags = materialize_banded(J, 0, 0)
        d = np.asarray(diags[0])  # concrete — host-side by construction
        safe = np.where(d != 0, d, 1.0)

        def apply(x):  # plain diagonal solve, no pure_callback, no hook
            flat, unravel = jax.flatten_util.ravel_pytree(x)
            return unravel(flat / jnp.asarray(safe, flat.dtype))

        return apply

    factory.host_side = True

    n = 128
    p = bratu1d.default_config(n, lam=2.0)  # well below critical λ*≈3.5138
    u0 = bratu1d.initial_guess(n)
    _, info = newton_krylov(bratu1d.residual, u0, p, algo="gmres", N=factory)
    assert info.solved
    assert newton_krylov._last_step._cache_size() == 1


def test_slot_matches_direct_apply():
    """_HostPrecondSlot(factory) applies exactly the factory's current
    factorization."""
    n = 128
    p = bratu1d.default_config(n)
    u0 = bratu1d.initial_guess(n)
    from newtonkrylov_tpu.operator import JacobianOperator

    J = JacobianOperator(bratu1d.residual, u0, p)
    factory = precond.ilu0(bandwidth=1)
    slot = _HostPrecondSlot(factory)
    slot.refresh(J)
    r = jnp.sin(jnp.linspace(0.0, 3.0, n))
    direct = factory(J)(r)
    np.testing.assert_allclose(
        np.asarray(slot(r)), np.asarray(direct), rtol=1e-6
    )


class TestPrecondRefreshOnce:
    """precond_refresh="once" freezes M/N at the u0 operator: the applies
    become loop-invariant (hoisted out of the while body / traced once into
    the host step), trading per-outer factory cost for a preconditioner that
    no longer tracks the linearization point (measured ~0 count impact for
    the J-weakly-dependent DST; bench flagship uses it)."""

    def test_jit_driver_once_matches_outer_counts(self):
        from newtonkrylov_tpu import newton_krylov_jit
        from newtonkrylov_tpu.fftprec import fft_poisson
        from newtonkrylov_tpu.problems import bratu2d

        n = 64
        p = bratu2d.default_config(n, lam=5.0)
        u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
        u_a, i_a = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-10,
            M=fft_poisson(), max_niter=30)
        u_b, i_b = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-10,
            M=fft_poisson(), max_niter=30, precond_refresh="once")
        assert bool(i_a.solved) and bool(i_b.solved)
        # DST M depends on J only through mean(diag): frozen-at-u0 counts
        # stay within a whisker (measured 6/7 once vs 7/8 outer — the u0
        # shift happens to center the spectrum slightly better here)
        assert abs(int(i_b.stats.inner_iterations)
                   - int(i_a.stats.inner_iterations)) <= 3
        assert abs(int(i_b.stats.outer_iterations)
                   - int(i_a.stats.outer_iterations)) <= 1
        # both states satisfy the claimed tolerance against the f64 oracle
        r0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u0, p)))
        for u in (u_a, u_b):
            r = float(jnp.linalg.norm(bratu2d.residual_scaled(u, p)))
            assert r <= 1e-12 + 1.2e-10 * r0

    def test_host_driver_once_with_host_factory(self):
        from newtonkrylov_tpu import newton_krylov, precond
        from newtonkrylov_tpu.problems import bratu1d

        n = 512
        p = bratu1d.default_config(n)
        u0 = bratu1d.initial_guess(n)
        u, info = newton_krylov(
            bratu1d.residual, u0, p, algo="gmres",
            N=precond.ilu0(bandwidth=1), krylov_kwargs={"ldiv": True},
            precond_refresh="once", max_niter=30)
        assert bool(info.solved)
        err = jnp.max(jnp.abs(u - bratu1d.true_solution(bratu1d.grid(n))))
        assert float(err) < 2e-3  # discretization level at n=512

    def test_rejects_unknown_mode(self):
        from newtonkrylov_tpu import newton_krylov, newton_krylov_jit
        from newtonkrylov_tpu.problems import simple

        u0 = jnp.asarray([2.0, 0.5])
        with pytest.raises(ValueError, match="precond_refresh"):
            newton_krylov(simple.residual, u0, None, precond_refresh="never")
        with pytest.raises(ValueError, match="precond_refresh"):
            newton_krylov_jit(simple.residual, u0, None, precond_refresh="never")
