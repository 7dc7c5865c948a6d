"""Geometric multigrid preconditioner tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import cg, newton_krylov_jit
from newtonkrylov_tpu.mg import multigrid2d, probe_5point, vcycle, _build_levels
from newtonkrylov_tpu.operator import JacobianOperator
from newtonkrylov_tpu.problems import bratu2d


def test_probe_recovers_coefficients():
    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    J = JacobianOperator(bratu2d.residual_scaled, u0, p)
    o, d = probe_5point(J)
    np.testing.assert_allclose(float(o), 1.0, rtol=1e-12)
    expected_d = -4.0 + p.dx * p.dx * p.lam * jnp.exp(u0)
    np.testing.assert_allclose(np.asarray(d), np.asarray(expected_d), rtol=1e-10)


def test_probe_unscaled_operator():
    """Coefficient probing also handles the 1/dx^2-scaled form."""
    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    J = JacobianOperator(bratu2d.residual, u0, p)
    o, d = probe_5point(J)
    np.testing.assert_allclose(float(o), 1.0 / p.dx**2, rtol=1e-10)


def test_vcycle_reduces_residual():
    """One V(2,2) cycle contracts the error substantially on a Poisson-like
    system."""
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    J = JacobianOperator(bratu2d.residual_scaled, u0, p)
    o, d = probe_5point(J)
    levels = _build_levels(o, d, 4)

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)))
    e = vcycle(b, levels)
    r = b - (levels[0].o * (jnp.pad(e, 1)[2:, 1:-1] + jnp.pad(e, 1)[:-2, 1:-1]
             + jnp.pad(e, 1)[1:-1, 2:] + jnp.pad(e, 1)[1:-1, :-2]) + levels[0].d * e)
    # (A is negative definite; the cycle still contracts toward A^{-1}b)
    assert float(jnp.linalg.norm(r)) < 0.6 * float(jnp.linalg.norm(b))


def test_mg_pcg_iteration_counts_resolution_independent():
    inner = {}
    for n in (64, 128):
        p = bratu2d.default_config(n, lam=5.0)
        u0 = bratu2d.initial_guess(n)
        u, info = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p, algo="cg", M=multigrid2d()
        )
        assert bool(info.solved)
        inner[n] = int(info.stats.inner_iterations)
    # plain CG grows ~linearly with n (hundreds); MG-PCG stays tens
    assert inner[64] < 40 and inner[128] < 40
    assert inner[128] <= 2 * inner[64]


def test_mg_pcg_matches_plain_cg_solution():
    n = 96  # not a power of two: hierarchy stops where division ends
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    u1, i1 = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")
    u2, i2 = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg", M=multigrid2d())
    assert bool(i1.solved) and bool(i2.solved)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-7)


def test_mg_with_fgmres():
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="fgmres", N=multigrid2d(),
        krylov_kwargs={"restart": 30},
    )
    assert bool(info.solved)
    assert int(info.stats.inner_iterations) < 40
