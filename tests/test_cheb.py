"""Chebyshev polynomial preconditioner tests.

The preconditioner is a *fixed* polynomial in the operator (M⁻¹ = p_k(A)),
so it must be (a) linear, (b) symmetric, (c) within the textbook Chebyshev
error bound of A⁻¹ when given exact spectral bounds, and (d) consumed by
plain CG with a large iteration-count reduction (the library Pallas kernel
in the hot path — VERDICT r2 #1).  The Pallas engine (interpret mode on
CPU) must agree with the portable XLA engine to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.operator import JacobianOperator
from newtonkrylov_tpu.precond import chebyshev
from newtonkrylov_tpu.problems import bratu2d
from newtonkrylov_tpu.solvers import cg


def _setup(n=16, lam=4.0, dtype=jnp.float64):
    p = bratu2d.default_config(n, lam=lam)
    u = bratu2d.initial_guess(n, dtype=dtype)
    J = JacobianOperator(bratu2d.residual_scaled, u, p)
    return J, p


def _dense(J, n):
    """Dense matrix of the (n², n²) operator by basis probing."""
    eye = jnp.eye(n * n, dtype=J.u.dtype).reshape(n * n, n, n)
    cols = jax.vmap(J.mv)(eye)
    return np.asarray(cols.reshape(n * n, n * n)).T


def test_cheb_error_bound_vs_exact_inverse():
    """With exact spectral bounds, ‖x_k − A⁻¹r‖_A obeys the Chebyshev bound."""
    n = 12
    J, _ = _setup(n)
    A = _dense(J, n)
    eigs = np.linalg.eigvalsh((A + A.T) / 2)
    lo, hi = eigs.min(), eigs.max()
    assert hi < 0, "scaled Bratu Jacobian is negative definite"

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, n)))
    x_true = np.linalg.solve(A, np.asarray(r).ravel())

    degree = 8
    M = chebyshev(degree=degree, bounds=(lo, hi), engine="xla")(J)
    x = np.asarray(M(r)).ravel()

    # error bound in the A-norm: 2 c^k/(1+c^{2k}), c = (√κ−1)/(√κ+1)
    kappa = lo / hi  # both negative; ratio of magnitudes
    c = (np.sqrt(kappa) - 1) / (np.sqrt(kappa) + 1)
    bound = 2 * c**degree / (1 + c ** (2 * degree))
    Apos = -A  # measure in the PD mirror's norm
    err = x - x_true
    a_norm = lambda v: float(np.sqrt(v @ (Apos @ v)))
    assert a_norm(err) <= 1.05 * bound * a_norm(x_true)


def test_cheb_linear_and_symmetric():
    n = 16
    J, _ = _setup(n)
    M = chebyshev(degree=6, engine="xla")(J)
    rng = np.random.default_rng(1)
    r1 = jnp.asarray(rng.standard_normal((n, n)))
    r2 = jnp.asarray(rng.standard_normal((n, n)))
    a, b = 1.3, -0.7
    lin = M(a * r1 + b * r2)
    np.testing.assert_allclose(
        np.asarray(lin), np.asarray(a * M(r1) + b * M(r2)), rtol=1e-12, atol=1e-12
    )
    s12 = float(jnp.vdot(r1, M(r2)))
    s21 = float(jnp.vdot(M(r1), r2))
    np.testing.assert_allclose(s12, s21, rtol=1e-11)


@pytest.mark.parametrize("degree", [1, 4, 7])
def test_cheb_pallas_engine_matches_xla_engine(degree):
    n = 16
    J, _ = _setup(n)
    Mx = chebyshev(degree=degree, engine="xla")(J)
    Mp = chebyshev(degree=degree, engine="pallas")(J)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal((n, n)))
    np.testing.assert_allclose(
        np.asarray(Mp(r)), np.asarray(Mx(r)), rtol=1e-10, atol=1e-12
    )


def test_cheb_pcg_cuts_iterations():
    """CG outer iterations drop by ~degree; total matvec budget stays sane."""
    n = 64
    J, _ = _setup(n, lam=4.0)
    b = J.res
    plain = cg(J, b, rtol=1e-8, atol=0.0)
    assert bool(plain.converged)

    degree = 8
    M = chebyshev(degree=degree, engine="xla")(J)
    pcg = cg(J, b, rtol=1e-8, atol=0.0, M=M)
    assert bool(pcg.converged)
    # same solution
    np.testing.assert_allclose(
        np.asarray(pcg.x), np.asarray(plain.x), rtol=1e-5, atol=1e-9
    )
    k_plain, k_pcg = int(plain.niter), int(pcg.niter)
    # polynomial preconditioning: outer iterations drop ~degree-fold, and
    # the total matvec count (outer·(degree+1)) must not exceed ~1.6× plain
    assert k_pcg * 2 <= k_plain, (k_plain, k_pcg)
    assert k_pcg * (degree + 1) <= 1.6 * k_plain, (k_plain, k_pcg)


def test_newton_cheb_cg_full_solve():
    """Full JFNK with the Chebyshev-preconditioned CG inner solve."""
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p,
        algo="cg", M=chebyshev(degree=8, engine="xla"),
        tol_rel=1e-10, max_niter=30,
    )
    assert bool(info.solved)
    nres = float(jnp.linalg.norm(bratu2d.residual_scaled(u, p)))
    nres0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u0, p)))
    assert nres <= 1e-9 * nres0


def test_newton_cheb_df32_refined():
    """df32-refined driver with the Chebyshev preconditioner in the f32 loop."""
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p,
        algo="cg", M=chebyshev(degree=8, engine="xla"),
        residual_df=bratu2d.residual_scaled_df,
        tol_rel=1e-8, max_niter=30,
    )
    assert bool(info.solved)
    res = bratu2d.residual_scaled(u, p)
    assert float(jnp.linalg.norm(res)) <= 1e-7 * float(
        jnp.linalg.norm(bratu2d.residual_scaled(u0, p))
    )


def test_cheb_lanczos_bounds_cut_iterations():
    """bounds="lanczos" (measured Ritz interval, far-end widened) beats the
    probed-Gershgorin default — Gershgorin's ±4|o| radius over-covers the
    spectrum ~2× and the polynomial wastes degree on empty interval."""
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.problems import bratu2d

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    _, i_g = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        M=chebyshev(degree=16, engine="xla"),
    )
    u_l, i_l = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        M=chebyshev(degree=16, bounds="lanczos", engine="xla"),
    )
    assert bool(i_l.solved)
    # measured: 28 -> 20 inners; assert a real margin, not the exact value
    assert int(i_l.stats.inner_iterations) < int(i_g.stats.inner_iterations)
    np.testing.assert_allclose(
        float(i_l.stats.n_res), 0.0, atol=1e-8 * 1.0
    )


def test_cheb_lanczos_bounds_sharded_parity():
    """The Lanczos bound estimate runs inside shard_map (psum-reduced
    Lanczos) and reproduces the single-device iteration counts."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.halo import (
        make_mesh,
        newton_krylov_sharded,
        sharded_residual_2d,
    )
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)

    def bratu2d_padded(up, p):
        u = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * u)
        return stencil + (p.dx * p.dx) * p.lam * jnp.exp(u)

    _, i_ref = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        M=chebyshev(degree=8, bounds="lanczos", engine="xla"),
    )
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(bratu2d_padded, ("i", "j"), "dirichlet")
    _, i_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs={
            "algo": "cg", "tol_rel": 1e-8,
            "M": chebyshev(degree=8, bounds="lanczos",
                           axis_names=("i", "j")),
        },
    )
    assert bool(i_sh.solved)
    assert int(i_sh.stats.inner_iterations) == int(i_ref.stats.inner_iterations)


def test_cheb_lanczos_bounds_sharded_parity_small_shards():
    """Regression: k must clamp to the GLOBAL dimension, not the local
    shard's — at n=8 on a 2x2 mesh each shard holds 16 entries < lanczos_k,
    and a local clamp silently shrank k per shard (8 vs 9 inners)."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.halo import (
        make_mesh,
        newton_krylov_sharded,
        sharded_residual_2d,
    )
    from newtonkrylov_tpu.problems import bratu2d

    n = 8  # 64 global unknowns; 16 per shard < lanczos_k=48
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)

    def bratu2d_padded(up, p):
        u = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * u)
        return stencil + (p.dx * p.dx) * p.lam * jnp.exp(u)

    _, i_ref = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        M=chebyshev(degree=8, bounds="lanczos", engine="xla"),
    )
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(bratu2d_padded, ("i", "j"), "dirichlet")
    _, i_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs={
            "algo": "cg", "tol_rel": 1e-8,
            "M": chebyshev(degree=8, bounds="lanczos",
                           axis_names=("i", "j")),
        },
    )
    assert bool(i_sh.solved)
    assert int(i_sh.stats.inner_iterations) == int(i_ref.stats.inner_iterations)
