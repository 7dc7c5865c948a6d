"""Two-grid preconditioner (Chebyshev smoother + half-resolution DST).

Must be symmetric (plain-CG safe), close to the exact-DST preconditioner in
iteration counts, and its smoother consumes the same Chebyshev engine the
fused Pallas kernel implements (equivalence pinned in test_cheb.py).
"""

import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.operator import JacobianOperator
from newtonkrylov_tpu.precond import two_grid
from newtonkrylov_tpu.problems import bratu2d
from newtonkrylov_tpu.solvers import cg


def _setup(n=64, lam=5.0):
    p = bratu2d.default_config(n, lam=lam)
    u = bratu2d.initial_guess(n, dtype=jnp.float64)
    return JacobianOperator(bratu2d.residual_scaled, u, p), p


def test_two_grid_symmetric():
    J, _ = _setup(32)
    M = two_grid(smoother_degree=4, engine="xla")(J)
    rng = np.random.default_rng(0)
    r1 = jnp.asarray(rng.standard_normal((32, 32)))
    r2 = jnp.asarray(rng.standard_normal((32, 32)))
    s12 = float(jnp.vdot(r1, M(r2)))
    s21 = float(jnp.vdot(M(r1), r2))
    np.testing.assert_allclose(s12, s21, rtol=1e-11)


def test_two_grid_pcg_close_to_exact_dst():
    J, _ = _setup(64)
    b = J.res
    k_dst = int(cg(J, b, rtol=1e-8, atol=0.0, M=fft_poisson()(J)).niter)
    res_tg = cg(J, b, rtol=1e-8, atol=0.0,
                M=two_grid(smoother_degree=8, engine="xla")(J))
    assert bool(res_tg.converged)
    k_tg = int(res_tg.niter)
    # two-grid trades exactness for per-apply cost; iteration count must
    # stay within a small factor of the exact fast-Poisson solve
    assert k_tg <= 4 * max(k_dst, 1) + 4, (k_tg, k_dst)


def test_newton_two_grid_full_solve():
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p,
        algo="cg", M=two_grid(smoother_degree=8, engine="xla"),
        tol_rel=1e-10, max_niter=30,
    )
    assert bool(info.solved)
    nres = float(jnp.linalg.norm(bratu2d.residual_scaled(u, p)))
    nres0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u0, p)))
    assert nres <= 1e-9 * nres0


def test_matmul_transfers_match_sliced():
    """transfer_matmul must reproduce the sliced bilinear P / full-weighting
    R exactly (same 9-3-3-1 weights, zero coarse ghosts) — the matmul pair
    is the TPU fast path, the sliced pair the oracle."""
    from newtonkrylov_tpu.mg import (
        _prolong_bilinear, _restrict_fw, transfer_matmul,
    )
    rng = np.random.default_rng(7)
    n = 32
    P, R = transfer_matmul(n, n, jnp.float64)
    e = jnp.asarray(rng.standard_normal((n // 2, n // 2)))
    r = jnp.asarray(rng.standard_normal((n, n)))
    np.testing.assert_allclose(np.asarray(P(e)), np.asarray(_prolong_bilinear(e)),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(R(r)), np.asarray(_restrict_fw(r)),
                               atol=1e-13)
    # adjointness: <P e, r> = 4 <e, R r>
    np.testing.assert_allclose(float(jnp.vdot(P(e), r)),
                               4.0 * float(jnp.vdot(e, R(r))), rtol=1e-12)
