"""Solver robustness / edge-path tests: breakdowns, singular systems,
divergence reporting, zero-sized tolerance paths, dtype propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import (
    bicgstab,
    cg,
    cgls,
    gmres,
    newton_krylov,
    newton_krylov_jit,
)


def test_gmres_happy_breakdown_exact():
    """If the Krylov space closes early (A nilpotent-ish), GMRES returns the
    exact solution at the breakdown step."""
    # A = I + N with N^2 = 0: solution found in <= 2 iterations
    n = 16
    N_ = jnp.zeros((n, n)).at[0, n - 1].set(0.5)
    A = jnp.eye(n) + N_
    x_true = jnp.arange(1.0, n + 1.0)
    b = A @ x_true
    res = gmres(lambda v: A @ v, b, restart=16, rtol=1e-14)
    assert int(res.niter) <= 3
    np.testing.assert_allclose(res.x, x_true, rtol=1e-10)


def test_gmres_singular_system_flags_no_convergence():
    A = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    b = jnp.array([1.0, 1.0, 1.0])  # inconsistent
    res = gmres(lambda v: A @ v, b, restart=3, itmax=6, rtol=1e-12)
    assert not bool(res.converged)
    assert np.isfinite(np.asarray(res.x)).all()


def test_cg_zero_diagonal_breakdown_flag():
    A = jnp.zeros((4, 4))
    b = jnp.ones(4)
    res = cg(lambda v: A @ v, b, itmax=8)
    assert bool(res.breakdown)


def test_bicgstab_breakdown_terminates():
    # rho = <rhat, r> = 0 immediately for antisymmetric A with this rhs
    A = jnp.array([[0.0, 1.0], [-1.0, 0.0]])
    b = jnp.array([1.0, 0.0])
    res = bicgstab(lambda v: A @ v, b, itmax=10)
    assert np.isfinite(np.asarray(res.x)).all()  # no NaNs even on breakdown


def test_newton_divergent_config_reports_unsolved():
    """Divergence is reported, not raised (reference behavior:
    examples/bratu.jl:159-177 shows diverging configs documented)."""

    def F(x, p):
        return jnp.array([x[0] ** 3 - 1e6])  # terrible scaling from far start

    u, info = newton_krylov(F, jnp.array([1e-8]), max_niter=3, forcing=None)
    assert not info.solved
    assert info.stats.outer_iterations <= 4


def test_newton_zero_initial_residual():
    """Starting at the root: zero outer iterations, solved immediately."""
    def F(x, p):
        return x * x - 1.0

    u, info = newton_krylov(F, jnp.array([1.0, -1.0]))
    assert info.solved
    assert info.stats.outer_iterations == 0

    u2, info2 = newton_krylov_jit(F, jnp.array([1.0, -1.0]))
    assert bool(info2.solved)
    assert int(info2.stats.outer_iterations) == 0


def test_dtype_propagation_f32():
    """Solvers run fully in f32 when given f32 data (no silent upcast)."""
    A = jnp.eye(8, dtype=jnp.float32) * 2.0
    b = jnp.ones(8, jnp.float32)
    res = gmres(lambda v: A @ v, b, rtol=1e-5)
    assert res.x.dtype == jnp.float32
    assert res.residual.dtype == jnp.float32
    res = cg(lambda v: A @ v, b, rtol=1e-5)
    assert res.x.dtype == jnp.float32


def test_cgls_inconsistent_least_squares():
    """CGLS converges to the least-squares solution for inconsistent rhs."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((20, 8)))
    b = jnp.asarray(rng.standard_normal(20))
    res = cgls(lambda v: A @ v, b, At=lambda w: A.T @ w, itmax=100, rtol=0.0, atol=1e-12)
    x_ls, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), x_ls, rtol=1e-6, atol=1e-8)


def test_rectangular_operator_shapes():
    """M != N residual/state sizes (reference supports M != length(u),
    src/Ariadne.jl:245-259) — cgls path."""
    def F(u, p):
        # 3 residuals, 2 unknowns
        return jnp.array([u[0] - 1.0, u[1] - 2.0, u[0] + u[1] - 3.0])

    from newtonkrylov_tpu.operator import JacobianOperator

    J = JacobianOperator(F, jnp.zeros(2), None)
    assert J.shape == (3, 2)
    res = cgls(J, J.res, rtol=1e-12)
    u = jnp.zeros(2) - res.x
    np.testing.assert_allclose(np.asarray(u), [1.0, 2.0], atol=1e-8)
