"""Matrix-free spectral diagnostics vs dense oracles.

The scalable replacement for the reference's materialize-then-cond studies
(examples/heat_1D.jl:55-93): Lanczos/Arnoldi Ritz values must reproduce the
dense spectrum exactly at k = n and bracket it at k < n.
"""

import jax
import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import JacobianOperator
from newtonkrylov_tpu.spectral import (
    FnOperator,
    arnoldi_hessenberg,
    cond2_estimate,
    extreme_eigs,
    lanczos_tridiag,
    ritz_values,
)


def _sym_operator(n, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.linspace(0.5, 9.5, n)
    M = jnp.asarray(Q @ np.diag(evals) @ Q.T)
    return FnOperator(lambda v: M @ v, jnp.zeros(n), rfn=lambda w: M.T @ w), evals


def test_lanczos_exact_at_k_equals_n():
    n = 24
    A, evals = _sym_operator(n)
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    alpha, beta, V, m = lanczos_tridiag(A, v0, n)
    T = np.diag(np.asarray(alpha)) + np.diag(np.asarray(beta[:-1]), 1) + np.diag(np.asarray(beta[:-1]), -1)
    np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(T)), evals, rtol=1e-9, atol=1e-9)
    # the stacked basis is orthonormal (full reorthogonalization)
    G = np.asarray(V) @ np.asarray(V).T
    np.testing.assert_allclose(G, np.eye(n), atol=1e-10)
    assert int(m) == n


def test_extreme_eigs_bracket_and_converge():
    # 1-D Laplacian (SPD mirror): extremes converge at modest k
    n = 200
    main = 2.0 * jnp.ones(n)
    A = FnOperator(
        lambda v: main * v - jnp.concatenate([v[1:], jnp.zeros(1)])
        - jnp.concatenate([jnp.zeros(1), v[:-1]]),
        jnp.zeros(n),
    )
    h = 1.0 / (n + 1)
    lam_min = 4 * np.sin(np.pi * h / 2) ** 2
    lam_max = 4 * np.sin(np.pi * n * h / 2) ** 2
    lo, hi = extreme_eigs(A, k=40)
    # Ritz values interlace: lo >= λmin, hi <= λmax — and both are close
    assert float(lo) >= lam_min - 1e-12
    assert float(hi) <= lam_max + 1e-12
    # the Laplacian's top eigenvalues cluster at 4 (λ ≈ 4−ε), slowing Ritz
    # convergence there — 0.998 at k=40/n=200 is the measured plateau
    assert float(hi) / lam_max > 0.998
    # the bottom of the Laplacian spectrum is quadratically clustered
    # (λ_j ≈ (jπh)²), so the k=40 Ritz minimum overshoots λ_min badly
    # (≈25× here) while still bracketing it — use k=n (exact) or the
    # Chebyshev lo_frac guard when the true floor matters
    assert float(lo) < 100 * lam_min


def test_lanczos_breakdown_on_identity():
    n = 16
    A = FnOperator(lambda v: v, jnp.zeros(n))
    v0 = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    alpha, beta, V, m = lanczos_tridiag(A, v0, 8)
    assert int(m) == 1  # invariant subspace after one step
    lo, hi = extreme_eigs(A, v0, k=8)
    np.testing.assert_allclose([float(lo), float(hi)], [1.0, 1.0], rtol=1e-12)


def test_arnoldi_full_spectrum_nonsymmetric():
    n = 20
    rng = np.random.default_rng(3)
    M = jnp.asarray(rng.standard_normal((n, n)))
    A = FnOperator(lambda v: M @ v, jnp.zeros(n))
    v0 = jnp.asarray(rng.standard_normal(n))
    H, V = arnoldi_hessenberg(A, v0, n)
    ritz = np.sort_complex(ritz_values(H))
    exact = np.sort_complex(np.linalg.eigvals(np.asarray(M)))
    np.testing.assert_allclose(ritz, exact, rtol=1e-8, atol=1e-8)
    # Arnoldi relation: A V_k^T = V^T H (V rows are the basis)
    Vn = np.asarray(V)
    np.testing.assert_allclose(
        np.asarray(M) @ Vn[:n].T, Vn.T @ np.asarray(H), atol=1e-9
    )


def test_cond2_exact_on_jacobian():
    # the reference's cond(collect(J)) study, matrix-free: step Jacobian of
    # the 2-D Bratu residual at u0 (n²=64 unknowns, k=n² → exact)
    from newtonkrylov_tpu.problems import bratu2d

    n = 8
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    J = JacobianOperator(bratu2d.residual_scaled, u0, p)
    kappa = float(cond2_estimate(J, k=n * n))
    J_dense = np.asarray(J.materialize())
    kappa_dense = np.linalg.cond(J_dense)
    np.testing.assert_allclose(kappa, kappa_dense, rtol=1e-6)


def test_extreme_eigs_feed_chebyshev():
    # matrix-free bounds → chebyshev preconditioner → solved system
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.precond import chebyshev
    from newtonkrylov_tpu.problems import bratu2d

    n = 16
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    J = JacobianOperator(bratu2d.residual_scaled, u0, p)
    lo, hi = extreme_eigs(J, k=64)
    assert float(hi) < 0  # scaled Bratu Jacobian is negative definite
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg",
        M=chebyshev(degree=8, bounds=(float(lo), float(hi)), engine="xla"),
    )
    assert bool(info.solved)


def test_extreme_eigs_sharded_parity():
    """The diagnostic runs under shard_map with ShardedSpace psum reductions
    and reproduces the single-device Ritz extremes bit-for-bit-ish."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map
    from newtonkrylov_tpu.halo import exchange_2d, make_mesh
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.spaces import ShardedSpace

    n = 32
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)

    J_ref = JacobianOperator(bratu2d.residual_scaled, u0, p)
    lo_ref, hi_ref = extreme_eigs(J_ref, jnp.ones_like(u0), k=24)

    mesh = make_mesh((2, 2), ("i", "j"))
    axes = ("i", "j")

    def local_residual(u_local, p):
        up = exchange_2d(u_local, axes, "dirichlet")
        v = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * v)
        return stencil + (p.dx * p.dx) * p.lam * jnp.exp(v)

    def run(u0):
        J = JacobianOperator(local_residual, u0, p)
        space = ShardedSpace(axis_names=axes)
        v0 = jax.tree.map(jnp.ones_like, u0)  # replicate-consistent start
        return extreme_eigs(J, v0, k=24, space=space)

    lo_sh, hi_sh = jax.jit(
        shard_map(run, mesh=mesh, in_specs=P("i", "j"), out_specs=(P(), P()))
    )(u0)
    np.testing.assert_allclose(float(lo_sh), float(lo_ref), rtol=1e-10)
    np.testing.assert_allclose(float(hi_sh), float(hi_ref), rtol=1e-10)


def test_convdiff_preconditioned_spectra_ground_recipe_map():
    """Measure, matrix-free, the spectral structure behind convdiff2d's
    recipe map.  At the manufactured root (n=32, dense oracle cross-checked
    while writing this test): the DST-preconditioned Jacobian has a growing
    cluster of negative-real eigenvalues — 6/1024 at c=2 (isolated
    outliers; unrestarted GMRES eats them, the recipe works), 24 at c=6,
    91 at c=25 (restarted DST-GMRES stalls) — while the ADI-preconditioned
    spectrum at c=25 is entirely positive and clustered in [0.41, 1.07]:
    the measured reason ADI is the convection-dominated recipe.  The k=80
    Arnoldi extremes reproduce the dense ones ([-3.33, 142.13] at c=2,
    [-90.03, 13.63] at c=6) — outliers are exactly what Ritz values
    converge to first."""
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.precond import adi
    from newtonkrylov_tpu.problems import convdiff2d

    n = 32
    k = 80

    def precond_ritz(c, factory):
        p = convdiff2d.default_config(n, c=c)
        u_star = convdiff2d.manufactured_solution(n)
        J = JacobianOperator(convdiff2d.residual_scaled, u_star, p)
        M = factory(J)
        A = FnOperator(lambda v: M(J.mv(v)), u_star)
        v0 = jnp.ones_like(u_star)
        H, _ = arnoldi_hessenberg(A, v0, k)
        return ritz_values(H).real

    r2 = precond_ritz(2.0, fft_poisson())
    np.testing.assert_allclose(r2.min(), -3.333, rtol=1e-2)
    np.testing.assert_allclose(r2.max(), 142.128, rtol=1e-2)

    r6 = precond_ritz(6.0, fft_poisson())
    assert r6.min() < 0 < r6.max()
    np.testing.assert_allclose(r6.min(), -90.03, rtol=1e-2)
    # the negative cluster grows with c (Ritz resolves the outliers first)
    assert (r6 < 0).sum() > (r2 < 0).sum()

    r25 = precond_ritz(25.0, adi(sweeps=4))
    assert (r25 > 0).all()  # ADI restores one-sidedness...
    assert r25.max() < 1.5  # ...and clusters the spectrum near 1

    # the round-5 multilevel factory tightens the cluster to near-identity
    # (measured [0.981, 1.003] real, |imag| < 4e-3) — the spectral reason
    # its GMRES counts are ~flat in n where single-level ADI grows
    from newtonkrylov_tpu.mg import multigrid2d_general

    rmg = precond_ritz(25.0, multigrid2d_general())
    assert (rmg > 0.9).all() and (rmg < 1.1).all()
    spread_adi = float(r25.max() - r25.min())
    spread_mg = float(rmg.max() - rmg.min())
    assert spread_mg < 0.2 * spread_adi, (spread_mg, spread_adi)


def test_lanczos_jits():
    n = 64
    A, _ = _sym_operator(n, seed=5)
    f = jax.jit(lambda v0: extreme_eigs(A, v0, k=16))
    lo, hi = f(jnp.asarray(np.random.default_rng(6).standard_normal(n)))
    assert float(lo) > 0.4 and float(hi) < 9.6
