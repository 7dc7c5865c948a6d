"""Pseudo-transient continuation (Ψtc) tests.

Globalization beyond the reference (its line search is an explicit TODO,
src/Ariadne.jl:341-344), from the reference's own citation base (Kelley 2003,
``ptcsol``; Kelley & Keyes SINUM 1998).  Three tiers: the ShiftedOperator
building block against a dense oracle, Newton-regime equivalence (δ → ∞), and
the canonical globalization witness — arctan from outside Newton's basin.
"""

import jax
import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import (
    Fixed,
    JacobianOperator,
    newton_krylov_jit,
    pseudo_transient,
)
from newtonkrylov_tpu.operator import ShiftedOperator


def F_kelley(x, p):
    return jnp.array([
        x[0] ** 2 + x[1] ** 2 - 2.0,
        jnp.exp(x[0] - 1.0) + x[1] ** 2 - 2.0,
    ])


# ---------------------------------------------------------------------------
# ShiftedOperator
# ---------------------------------------------------------------------------


def test_shifted_operator_dense_oracle():
    x = jnp.array([3.0, 5.0])
    J = JacobianOperator(F_kelley, x)
    alpha = jnp.asarray(0.7)
    A = ShiftedOperator(J, alpha)
    J_dense = J.materialize()
    A_dense = A.materialize()
    np.testing.assert_allclose(A_dense, J_dense + 0.7 * np.eye(2), rtol=1e-14)
    # adjoint: (alpha I + J)^T = alpha I + J^T
    v = jnp.array([0.3, -1.2])
    np.testing.assert_allclose(A.rmv(v), A_dense.T @ v, rtol=1e-13)
    np.testing.assert_allclose(A.T.mv(v), A_dense.T @ v, rtol=1e-13)
    # batched paths
    V = jnp.array([[1.0, 0.0], [0.0, 1.0], [2.0, -3.0]])
    np.testing.assert_allclose(A.mm(V), V @ A_dense.T, rtol=1e-13)
    np.testing.assert_allclose(A.rmm(V), V @ A_dense, rtol=1e-13)


def test_shifted_operator_accepts_python_float():
    # regression: the documented public form ShiftedOperator(J, 0.7) with a
    # plain float crashed on .astype before alpha normalization
    x = jnp.array([3.0, 5.0])
    J = JacobianOperator(F_kelley, x)
    A = ShiftedOperator(J, 0.7)
    v = jnp.array([1.0, -2.0])
    np.testing.assert_allclose(A.mv(v), J.mv(v) + 0.7 * v, rtol=1e-14)
    np.testing.assert_allclose(A.rmv(v), J.rmv(v) + 0.7 * v, rtol=1e-14)


def test_shifted_operator_passthrough():
    x = jnp.array([3.0, 5.0])
    J = JacobianOperator(F_kelley, x)
    A = ShiftedOperator(J, jnp.asarray(2.0))
    # factories read .u / .res off the operator they are handed
    np.testing.assert_array_equal(A.u, J.u)
    np.testing.assert_array_equal(A.res, J.res)
    assert A.shape == J.shape


# ---------------------------------------------------------------------------
# Newton-regime equivalence: huge δ0 ⇒ the shift is negligible ⇒ Ψtc steps
# are inexact Newton steps with identical iteration counts.
# ---------------------------------------------------------------------------


def test_ptc_newton_regime_matches_newton():
    u0 = jnp.array([2.0, 0.5])
    forcing = Fixed(1.0e-4)
    u_n, info_n = newton_krylov_jit(F_kelley, u0, forcing=forcing)
    u_p, info_p = pseudo_transient(
        F_kelley, u0, delta0=1.0e14, delta_max=1.0e14, forcing=forcing
    )
    assert info_p.solved
    assert int(info_p.stats.outer_iterations) == int(info_n.stats.outer_iterations)
    assert int(info_p.stats.inner_iterations) == int(info_n.stats.inner_iterations)
    np.testing.assert_allclose(u_p, u_n, atol=1e-9)


# ---------------------------------------------------------------------------
# Globalization: arctan from |x0| > ~1.39 — plain Newton provably diverges
# (the Newton step overshoots with growing amplitude), Ψtc converges.
# ---------------------------------------------------------------------------


def F_atan(x, p):
    return jnp.arctan(x)


def test_newton_diverges_on_atan():
    u, info = newton_krylov_jit(F_atan, jnp.array([3.0]), max_niter=20)
    assert not bool(info.solved)
    # the iterates blow up (|x| squares each step once |x| is large)
    assert float(jnp.abs(u[0])) > 1.0e3


def test_ptc_converges_on_atan():
    u, info = pseudo_transient(F_atan, jnp.array([3.0]))
    assert bool(info.solved)
    assert abs(float(u[0])) < 1.0e-5
    assert int(info.stats.outer_iterations) <= 10


def test_ptc_converges_from_far_away():
    u, info = pseudo_transient(F_atan, jnp.array([100.0]))
    assert bool(info.solved)
    assert abs(float(u[0])) < 1.0e-5


def test_ptc_history_monotone_tail():
    # once in the Newton regime the trace decreases strictly
    _, info = pseudo_transient(F_atan, jnp.array([3.0]))
    h = np.asarray(info.history)
    h = h[np.isfinite(h)]
    assert h[-1] < h[0]
    assert np.all(np.diff(h[-3:]) < 0)


def test_ptc_jits_and_vmaps():
    solve = jax.jit(lambda x0: pseudo_transient(F_atan, x0)[0])
    u = solve(jnp.array([3.0]))
    assert abs(float(u[0])) < 1.0e-5
    # a batch of independent Ψtc solves as one SPMD program
    batch = jax.vmap(lambda x0: pseudo_transient(F_atan, x0)[1].solved)(
        jnp.array([[2.0], [5.0], [-4.0]])
    )
    assert bool(jnp.all(batch))


# ---------------------------------------------------------------------------
# PDE scale: 2-D Bratu near the fold.  Ψtc follows du/dτ = −F, so F must be
# written with the stable-flow sign (−Δu − λeᵘ: the heat flow decays to the
# lower branch); δ0 ~ 1/dx² matches the dx²-scaled residual's pseudo-time
# unit.  From rough large-amplitude starts near the fold, Ψtc needs fewer
# outer steps than plain Newton — and it composes with the DST
# preconditioner factory inside the loop (the factory probes the *shifted*
# operator).
# ---------------------------------------------------------------------------


def test_ptc_bratu2d_near_fold():
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=6.8)  # fold at λ* ≈ 6.808
    X, Y = bratu2d.grid(n)
    u_rough = 2.5 * jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)

    def negF(u, p):
        return -bratu2d.residual_scaled(u, p)

    u_n, info_n = newton_krylov_jit(
        bratu2d.residual_scaled, u_rough, p,
        algo="gmres", tol_rel=1e-10, M=fft_poisson(), max_niter=50,
    )
    u_p, info_p = pseudo_transient(
        negF, u_rough, p,
        algo="gmres", tol_rel=1e-10, M=fft_poisson(),
        delta0=float((n + 1) ** 2), max_steps=60,
    )
    assert bool(info_p.solved)
    # same (lower-branch) solution as Newton, in fewer outer steps
    np.testing.assert_allclose(u_p, u_n, atol=1e-8)
    assert int(info_p.stats.outer_iterations) < int(info_n.stats.outer_iterations)


def test_ptc_standard_start_is_cheap():
    # from the standard sin-bump start Ψtc costs ~Newton (5 steps at λ=6)
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=6.0)
    u0 = bratu2d.initial_guess(n)
    _, info = pseudo_transient(
        lambda u, p: -bratu2d.residual_scaled(u, p), u0, p,
        algo="gmres", tol_rel=1e-10, M=fft_poisson(),
        delta0=float((n + 1) ** 2), max_steps=60,
    )
    assert bool(info.solved)
    assert int(info.stats.outer_iterations) <= 7


def test_ptc_sharded_parity():
    """Ψtc composes with shard_map + ShardedSpace like the Newton drivers:
    identical iteration counts and state to single-device."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.halo import exchange_2d, make_mesh
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.spaces import ShardedSpace

    n = 32
    p = bratu2d.default_config(n, lam=6.0)
    u0 = bratu2d.initial_guess(n)
    d0 = float((n + 1) ** 2)
    axes = ("i", "j")
    mesh = make_mesh((2, 2), axes)

    negF = lambda u, p: -bratu2d.residual_scaled(u, p)
    u_ref, info_ref = pseudo_transient(
        negF, u0, p, algo="gmres", tol_rel=1e-10, M=fft_poisson(),
        delta0=d0, max_steps=60,
    )
    assert bool(info_ref.solved)

    def negF_local(u_local, p):
        up = exchange_2d(u_local, axes, "dirichlet")
        v = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * v)
        return -(stencil + (p.dx * p.dx) * p.lam * jnp.exp(v))

    def run(u0):
        return pseudo_transient(
            negF_local, u0, p, algo="gmres", tol_rel=1e-10,
            M=fft_poisson(axis_names=axes, scope="global"), delta0=d0, max_steps=60,
            space=ShardedSpace(axis_names=axes),
            krylov_kwargs={"restart": 100},
        )

    u_sh, info_sh = jax.jit(
        jax.shard_map(
            run, mesh=mesh, in_specs=P("i", "j"),
            out_specs=(P("i", "j"), jax.tree.map(lambda _: P(), info_ref)),
            check_vma=False,
        )
    )(u0)
    assert bool(info_sh.solved)
    assert int(info_sh.stats.outer_iterations) == int(info_ref.stats.outer_iterations)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)


def test_ptc_through_newton_krylov_sharded_driver_seam():
    """The SPMD wrapper's driver= seam (round 5): pseudo_transient rides
    newton_krylov_sharded's exact wrapping — the configuration
    __graft_entry__.dryrun_multichip certifies."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.halo import (
        make_mesh, newton_krylov_sharded, sharded_residual_2d,
    )
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=6.0)
    u0 = bratu2d.initial_guess(n)
    d0 = float((n + 1) ** 2)
    axes = ("i", "j")
    mesh = make_mesh((2, 2), axes)

    def neg_padded(up, pp):
        v = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * v)
        return -(stencil + (pp.dx * pp.dx) * pp.lam * jnp.exp(v))

    F_local = sharded_residual_2d(neg_padded, axes, "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        driver=pseudo_transient,
        newton_kwargs=dict(
            algo="gmres", tol_rel=1e-10, delta0=d0, max_steps=60,
            M=fft_poisson(axis_names=axes, scope="global"),
            krylov_kwargs={"restart": 100},
        ),
    )
    assert bool(info_sh.solved)

    negF = lambda u, pp: -bratu2d.residual_scaled(u, pp)  # noqa: E731
    u_ref, info_ref = pseudo_transient(
        negF, u0, p, algo="gmres", tol_rel=1e-10, M=fft_poisson(),
        delta0=d0, max_steps=60,
    )
    assert int(info_sh.stats.outer_iterations) == int(info_ref.stats.outer_iterations)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)


def test_ptc_krylov_dtype_refinement():
    # f32 inner loop, f64 state — the mixed-precision seam of the Newton
    # drivers carried over
    u, info = pseudo_transient(
        F_atan, jnp.array([3.0]), krylov_dtype=jnp.float32, tol_rel=1e-10
    )
    assert bool(info.solved)
    assert abs(float(u[0])) < 1.0e-8


def test_ptc_residual_df():
    """Ψtc with the df32 acceptance residual: 1e-8 on 2-D Bratu with an f32
    inner loop, matching the f64 oracle solve (the production
    mixed-precision seam, identical to newton_krylov_jit's)."""
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=6.0)
    u0 = bratu2d.initial_guess(n)
    d0 = float((n + 1) ** 2)

    def negF(u, p):
        return -bratu2d.residual_scaled(u, p)

    def negF_df(u, p):
        from newtonkrylov_tpu import df32 as dd

        r = bratu2d.residual_scaled_df(u, p)
        return dd.DF(-r.hi, -r.lo)

    u_ref, info_ref = pseudo_transient(
        negF, u0, p, algo="gmres", tol_rel=1e-8, M=fft_poisson(),
        delta0=d0, max_steps=60,
    )
    assert bool(info_ref.solved)

    u_df, info_df = pseudo_transient(
        negF, u0, p, algo="gmres", tol_rel=1e-8,
        M=fft_poisson(precision="high"), delta0=d0, max_steps=60,
        residual_df=negF_df,
    )
    assert bool(info_df.solved)
    # same root to well below the 1e-8 target; f64 in/out at the boundary
    assert u_df.dtype == u_ref.dtype
    np.testing.assert_allclose(np.asarray(u_df), np.asarray(u_ref), atol=1e-7)
