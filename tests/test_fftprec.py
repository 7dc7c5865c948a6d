"""DST fast-Poisson preconditioner tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import dst1, fft_poisson, idst1
from newtonkrylov_tpu.operator import JacobianOperator
from newtonkrylov_tpu.problems import bratu2d


def test_dst_roundtrip_and_definition():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((7, 5)))
    for ax in (0, 1):
        np.testing.assert_allclose(idst1(dst1(x, ax), ax), x, atol=1e-12)
    # definition check against the explicit sine sum on axis 0
    n = x.shape[0]
    j = np.arange(n)
    S = np.sin(np.pi * np.outer(j + 1, j + 1) / (n + 1))
    np.testing.assert_allclose(np.asarray(dst1(x, 0)), S @ np.asarray(x), atol=1e-12)


def test_exact_inverse_constant_coefficients():
    n = 32

    def Fc(u, p):
        up = jnp.pad(u, 1)
        lap = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
        return lap + 0.01 * u

    J = JacobianOperator(Fc, jnp.zeros((n, n)), None)
    app = fft_poisson()(J)
    v = jnp.asarray(np.random.default_rng(1).standard_normal((n, n)))
    np.testing.assert_allclose(np.asarray(app(J.mv(v))), np.asarray(v), atol=1e-10)


def test_bratu2d_near_exact_preconditioning():
    """Variable-coefficient Bratu: ~1 inner iteration per Newton step."""
    for n in (64, 128):
        p = bratu2d.default_config(n, lam=5.0)
        u0 = bratu2d.initial_guess(n)
        u, info = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p, algo="cg", M=fft_poisson()
        )
        assert bool(info.solved)
        assert int(info.stats.inner_iterations) <= int(info.stats.outer_iterations) + 3


def test_matches_unpreconditioned_solution():
    n = 96
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    u1, i1 = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")
    u2, i2 = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg", M=fft_poisson())
    assert bool(i2.solved)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-7)


def test_unscaled_operator_and_rectangular_grid():
    """Works for the 1/dx^2-scaled residual too (o probed, not assumed)."""
    n = 48
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    u, info = newton_krylov_jit(bratu2d.residual, u0, p, algo="cg", M=fft_poisson())
    assert bool(info.solved)
    assert int(info.stats.inner_iterations) <= int(info.stats.outer_iterations) + 3


def test_global_scope_argument_validation():
    import pytest

    from newtonkrylov_tpu.fftprec import fft_poisson

    with pytest.raises(ValueError, match="requires axis_names"):
        fft_poisson(scope="global")
    with pytest.raises(ValueError, match="matmul engine"):
        fft_poisson(scope="global", method="fft", axis_names=("i", "j"))
    with pytest.raises(ValueError, match="unknown scope"):
        fft_poisson(scope="galactic")


def test_global_scope_size_guard_past_matmul_cap():
    """The scope="global" guard fires at trace time once the inferred
    GLOBAL side exceeds _MATMUL_MAX_N — backed by round-5 measurement:
    the FFT engine (the only alternative) is a flat 20–24× slower than
    the matmul DST at every size on v5e and fails to compile at 8192², so
    past the cap the answer is MG or sharding, never a silent engine
    swap (fft_poisson docstring)."""
    import pytest
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.halo import make_mesh
    from newtonkrylov_tpu.operator import JacobianOperator

    mesh = make_mesh((1, 8), ("i", "j"))
    factory = fft_poisson(scope="global", axis_names=("i", "j"))
    nl = 520  # global side 8*520 = 4160 > 4096

    def body(u_local):
        J = JacobianOperator(lambda u, p: -4.0 * u, u_local, None)
        return factory(J)(u_local)

    f = jax.shard_map(
        body, mesh=mesh, in_specs=(P("i", "j"),), out_specs=P("i", "j"),
        check_vma=False,
    )
    with pytest.raises(ValueError, match="_MATMUL_MAX_N"):
        jax.eval_shape(f, jax.ShapeDtypeStruct((nl, 8 * nl), jnp.float32))
