"""JacobianOperator parity tests.

Mirrors the reference's operator test tier (test/runtests.jl:28-67): shapes,
JVP against hand-known columns, VJP row extraction, materialization against a
dense AD oracle, random-vector products, adjoint consistency, and batched
multi-vector products.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import JacobianOperator, materialize_banded, materialize_dense


def F_kelley(x, p):
    """Kelley2003 2x2 system (test/runtests.jl:4-8, examples/simple.jl:6-10)."""
    return jnp.array([
        x[0] ** 2 + x[1] ** 2 - 2.0,
        jnp.exp(x[0] - 1.0) + x[1] ** 2 - 2.0,
    ])


@pytest.fixture
def J():
    return JacobianOperator(F_kelley, jnp.array([3.0, 5.0]), None)


def test_shape_dtype(J):
    # cf. test/runtests.jl:32-34
    assert J.shape == (2, 2)
    assert J.dtype == jnp.float64


def test_primal_residual(J):
    np.testing.assert_allclose(J.res, F_kelley(jnp.array([3.0, 5.0]), None))


def test_jvp_known_column(J):
    # J e1 = [6.0, e^2] (test/runtests.jl:36-38)
    out = J.mv(jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(out, [6.0, 7.38905609893065], rtol=1e-14)


def test_vjp_known_row(J):
    # J' e1 = [6.0, 10.0] (test/runtests.jl:40-42)
    out = J.rmv(jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(out, [6.0, 10.0], rtol=1e-14)


def test_materialize_matches_jacfwd(J):
    # cf. test/runtests.jl:44-46 (collect(J) == Enzyme oracle)
    J_dense = materialize_dense(J)
    J_oracle = jax.jacfwd(lambda x: F_kelley(x, None))(jnp.array([3.0, 5.0]))
    np.testing.assert_allclose(J_dense, J_oracle, rtol=1e-14)


def test_random_vector_product(J):
    # cf. test/runtests.jl:48-52
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(2))
    J_oracle = jax.jacfwd(lambda x: F_kelley(x, None))(jnp.array([3.0, 5.0]))
    np.testing.assert_allclose(J.mv(v), J_oracle @ v, rtol=1e-13)


def test_adjoint_transpose_consistency(J):
    # cf. test/runtests.jl:54 (collect(J') == collect(J)')
    Jt = materialize_dense(J.T)
    Jd = materialize_dense(J)
    np.testing.assert_allclose(Jt, Jd.T, rtol=1e-14)


def test_batched_mm(J):
    # cf. test/runtests.jl:57-66 (BatchDuplicated paths)
    V = jnp.eye(2)
    out = J.mm(V)  # rows are J @ e_i -> out == J^T rows... out[i] = J e_i
    J_oracle = jax.jacfwd(lambda x: F_kelley(x, None))(jnp.array([3.0, 5.0]))
    np.testing.assert_allclose(out, J_oracle.T, rtol=1e-14)
    outT = J.rmm(V)
    np.testing.assert_allclose(outT, J_oracle, rtol=1e-14)


def test_pytree_state_operator():
    """Operators work over pytree states (no flattening requirement)."""

    def F(u, p):
        return {"a": u["a"] * u["b"], "b": u["a"] + p * u["b"]}

    u = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([3.0, 4.0])}
    J = JacobianOperator(F, u, 2.0)
    v = {"a": jnp.array([1.0, 0.0]), "b": jnp.array([0.0, 1.0])}
    out = J.mv(v)
    np.testing.assert_allclose(out["a"], [3.0, 2.0])  # b*da + a*db
    np.testing.assert_allclose(out["b"], [1.0, 2.0])  # da + p*db


def test_materialize_banded_tridiagonal():
    """Colored probing recovers a tridiagonal stencil Jacobian exactly."""
    n = 64
    dx = 1.0 / (n + 1)

    def F(y, p):
        lam = p
        y_l = jnp.concatenate([jnp.zeros(1, y.dtype), y[:-1]])
        y_r = jnp.concatenate([y[1:], jnp.zeros(1, y.dtype)])
        return (y_r - 2 * y + y_l) / dx**2 + lam * jnp.exp(y)

    u = jnp.sin(jnp.pi * jnp.linspace(dx, 1 - dx, n))
    J = JacobianOperator(F, u, 3.51382)
    offsets, diags = materialize_banded(J, 1, 1)
    dense = materialize_dense(J)

    assert list(offsets) == [-1, 0, 1]
    for off, diag in zip([-1, 0, 1], diags):
        expect = jnp.diagonal(dense, off)
        got = diag[max(0, -off): n - max(0, off)] if off < 0 else diag[: n - off]
        np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_stencil_coloring_minimal_periods():
    from newtonkrylov_tpu.operator import stencil_coloring

    assert stencil_coloring((-1, 0, 1)) == 3
    assert stencil_coloring(range(-2, 3)) == 5
    # 2-D 5-point at m=100: {-100,-1,0,1,100} needs only 6 colors, not 201
    assert stencil_coloring((-100, -1, 0, 1, 100)) == 6
    c = stencil_coloring((-64, -1, 0, 1, 64))
    offs = [-64, -1, 0, 1, 64]
    assert len({o % c for o in offs}) == len(offs)


def test_materialize_csr_matches_dense_tridiagonal():
    from newtonkrylov_tpu.operator import materialize_csr
    from newtonkrylov_tpu.problems import bratu1d

    n = 64
    p = bratu1d.default_config(n, lam=2.0)
    J = JacobianOperator(bratu1d.residual, bratu1d.initial_guess(n), p)
    indptr, cols, vals = materialize_csr(J, (-1, 0, 1))
    dense = np.asarray(materialize_dense(J))
    rebuilt = np.zeros_like(dense)
    for i in range(n):
        for jj in range(indptr[i], indptr[i + 1]):
            rebuilt[i, cols[jj]] = vals[jj]
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)
    assert indptr[-1] == 3 * n - 2  # O(nnz), no dense intermediate


def test_materialize_csr_matches_dense_5point():
    from newtonkrylov_tpu.operator import materialize_csr
    from newtonkrylov_tpu.problems import bratu2d

    m = 12
    p = bratu2d.default_config(m, lam=1.5)
    u0 = bratu2d.initial_guess(m)

    def flatres(u, pp):
        return bratu2d.residual_scaled(u.reshape(m, m), pp).reshape(-1)

    J = JacobianOperator(flatres, u0.reshape(-1), p)
    indptr, cols, vals = materialize_csr(J, (-m, -1, 0, 1, m))
    dense = np.asarray(materialize_dense(J))
    rebuilt = np.zeros_like(dense)
    for i in range(m * m):
        rebuilt[i, cols[indptr[i]: indptr[i + 1]]] = vals[indptr[i]: indptr[i + 1]]
    np.testing.assert_allclose(rebuilt, dense, atol=1e-12)
