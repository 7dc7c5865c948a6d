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


# --- variable-coefficient multigrid (round 5, VERDICT r4 next #2) -----------

def test_coarsen_general_constant_laplacian_anchor():
    """The physical-parts coarsening reproduces the exact 2h
    rediscretization of the constant Laplacian + mass stencil: couplings
    invariant, mass x4 (the sanity anchor in _coarsen_general's docstring)."""
    import jax.numpy as jnp

    from newtonkrylov_tpu.mg import _coarsen_general

    n, w, h2 = 16, 0.7, 1.0 / (17 ** 2)
    one = jnp.ones((n, n))
    coeffs = ((-4.0 + h2 * w) * one, one, one, one, one)
    a0c, aipc, aimc, ajpc, ajmc = _coarsen_general(coeffs)
    for c in (aipc, aimc, ajpc, ajmc):
        np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a0c), -4.0 + 4.0 * h2 * w,
                               atol=1e-12)


def test_coarsen_general_convection_scaling():
    """The antisymmetric (convection) part doubles per level: upwind-ish
    couplings s +- t coarsen to s +- 2t (away from the upwind clamp)."""
    import jax.numpy as jnp

    from newtonkrylov_tpu.mg import _coarsen_general

    n, s, t = 16, 1.0, 0.2
    one = jnp.ones((n, n))
    coeffs = (-(2 * s + 2 * s) * one, (s + t) * one, (s - t) * one,
              s * one, s * one)
    a0c, aipc, aimc, _, _ = _coarsen_general(coeffs)
    np.testing.assert_allclose(np.asarray(aipc), s + 2 * t, atol=1e-12)
    np.testing.assert_allclose(np.asarray(aimc), s - 2 * t, atol=1e-12)


def test_mg_general_matches_scalar_mg_quality_on_bratu():
    """On the constant-off-diagonal operator the general factory must be a
    competitive preconditioner too (it solves a superset problem):
    iteration counts within ~2x of scalar MG-PCG on 2-D Bratu."""
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.mg import multigrid2d, multigrid2d_general
    from newtonkrylov_tpu.problems import bratu2d

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u_s, i_s = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-10,
        M=multigrid2d(), forcing=None, max_niter=15)
    u_g, i_g = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="gmres", tol_rel=1e-10,
        M=multigrid2d_general(), forcing=None, max_niter=15,
        krylov_kwargs={"restart": None, "itmax": 200})
    assert bool(i_s.solved) and bool(i_g.solved)
    assert int(i_g.stats.inner_iterations) <= 2 * int(i_s.stats.inner_iterations)
    np.testing.assert_allclose(np.asarray(u_g), np.asarray(u_s), atol=1e-9)


def test_coarsen_general_sign_mirror():
    """Review regression: the upwind clamp must respect the operator's own
    sign orientation.  The exact sign-mirror of a stencil (positive
    diagonal, negative off-diagonals -- the textbook SPD convention) is an
    equally valid operator; a sign-blind max() zeroed every coarse
    coupling for it."""
    import jax.numpy as jnp

    from newtonkrylov_tpu.mg import _coarsen_general

    n, w, h2 = 16, 0.7, 1.0 / (17 ** 2)
    one = jnp.ones((n, n))
    neg = ((-4.0 + h2 * w) * one, one, one, one, one)
    pos = tuple(-c for c in neg)
    a0n, *coupn = _coarsen_general(neg)
    a0p, *coupp = _coarsen_general(pos)
    # mirror symmetry: coarsening commutes with the global sign flip
    np.testing.assert_allclose(np.asarray(a0p), -np.asarray(a0n), atol=1e-12)
    for cp, cn in zip(coupp, coupn):
        np.testing.assert_allclose(np.asarray(cp), -np.asarray(cn), atol=1e-12)
        assert float(jnp.max(jnp.abs(cp))) > 0.5  # couplings survived


def test_coarsen_general_shift_dominated_keeps_couplings():
    """Review regression (round 5): the clamp orientation must come from
    each direction's OWN symmetric part, not the diagonal's sign.  A
    shift-dominated operator -- ShiftedOperator(J, 1/delta) with
    1/delta > 4, i.e. pseudo_transient's stressed small-delta phase --
    has a POSITIVE diagonal with the couplings still positive; the old
    diagonal-keyed clamp zeroed every coarse coupling there, silently
    degrading multigrid2d_general to a diagonal preconditioner."""
    import jax.numpy as jnp

    from newtonkrylov_tpu.mg import _coarsen_general

    n = 16
    one = jnp.ones((n, n))
    # -4 + 1/delta with delta = 1/6: diagonal +2, couplings +1
    coeffs = (2.0 * one, one, one, one, one)
    a0c, *coup = _coarsen_general(coeffs)
    for c in coup:
        np.testing.assert_allclose(np.asarray(c), 1.0, atol=1e-12)
    # row-sum part: m = 4*(2+4) = 24, minus the four couplings
    np.testing.assert_allclose(np.asarray(a0c), 20.0, atol=1e-12)


def test_mg_general_under_shifted_operator_solves():
    """End-to-end guard for the same regression: multigrid2d_general
    preconditioning a strongly shifted Jacobian (the PTC small-delta
    shape, diagonal sign flipped by the shift) must still converge with
    multilevel/ADI-quality counts.  The shift is chosen PAST the
    indefinite band (for the Dx2-scaled Laplacian-like J, eigen(aI+J) is
    [a-8, a]: a in (0, 8) is a Helmholtz-like indefinite operator no
    geometric MG is expected to handle) -- the regression under test is
    the clamp orientation, which the old code got wrong for ANY a > 4."""
    from newtonkrylov_tpu.mg import multigrid2d_general
    from newtonkrylov_tpu.operator import JacobianOperator, ShiftedOperator
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.solvers import gmres

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u = bratu2d.initial_guess(n, dtype=jnp.float64)
    J = JacobianOperator(bratu2d.residual_scaled, u, p)
    Js = ShiftedOperator(J, 8.5)  # diagonal ~ +4.5: sign flipped, definite
    M = multigrid2d_general()(Js)
    b = J.res
    res = gmres(Js, b, M=M, rtol=1e-10, restart=None, itmax=200)
    assert bool(res.converged)
    # measured 1 inner (ADI solves the strongly-diagonal case exactly);
    # unpreconditioned takes 17
    assert int(res.niter) <= 5


def test_mg_general_nonsquare_grid_level_cap():
    """Review regression: the hierarchy depth must respect BOTH dims --
    (32, 50) coarsens once to (16, 25) and must stop there (25 is odd;
    another 2x2 VALID window would silently drop a row)."""
    from newtonkrylov_tpu.mg import _levels_cap, multigrid2d_general
    from newtonkrylov_tpu.operator import JacobianOperator

    assert _levels_cap((32, 50), 8) == 2
    assert _levels_cap((32, 32), 8) == 3
    assert _levels_cap((32, 50), 16) == 2
    assert _levels_cap((30, 50), 8) == 2  # 15x25: both odd after one step

    n, m = 32, 50
    dx = 1.0 / (n + 1)

    def F(u, p):
        up = jnp.pad(u, 1)
        s = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2]
        return s - 4.0 * u + dx * dx * jnp.exp(u)

    u0 = jnp.zeros((n, m))
    J = JacobianOperator(F, u0, None)
    apply = multigrid2d_general()(J)
    out = apply(jnp.ones((n, m)))  # must trace and run, shapes consistent
    assert out.shape == (n, m) and bool(jnp.all(jnp.isfinite(out)))
