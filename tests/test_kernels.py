"""Pallas stencil-kernel tests (interpret mode on CPU; compiled on TPU).

Mirrors the role of the reference's KernelAbstractions example
(examples/bratu_ka.jl): the kernel layer must be differentiable-through and
bit-consistent with the plain residual.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import MaskedSpace, newton_krylov_jit
from newtonkrylov_tpu.kernels.stencil2d import (
    aligned_interior,
    aligned_mask,
    aligned_wrap,
    bratu_residual_pallas,
    stencil_jvp_pallas,
    stencil_jvp_xla,
)
from newtonkrylov_tpu.problems import bratu2d


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, n)))


@pytest.mark.parametrize("n", [16, 64])
def test_jvp_kernel_matches_xla(n):
    v = aligned_wrap(_rand(n, 0))
    w = aligned_wrap(jnp.abs(_rand(n, 1)) + 0.1)
    ref = stencil_jvp_xla(v, w, n)
    got = stencil_jvp_pallas(v, w, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_jvp_chain_kernel_matches_iterated_single_step():
    from newtonkrylov_tpu.kernels.stencil2d import stencil_jvp_chain_pallas

    n, k, s = 16, 4, 0.125
    v = aligned_wrap(_rand(n, 4))
    w = aligned_wrap(jnp.abs(_rand(n, 5)) + 0.1)
    ref = v
    for _ in range(k):
        ref = stencil_jvp_xla(ref, w, n) * s
    got = stencil_jvp_chain_pallas(v, w, n=n, k=k, scale=s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)
    # the chained state must preserve the ghost/apron-zero layout invariant
    mask = aligned_mask(n, got.dtype)
    assert float(jnp.max(jnp.abs(got * (1 - mask)))) == 0.0


def test_jvp_kernel_multitile():
    n = 64
    v = aligned_wrap(_rand(n, 2))
    w = aligned_wrap(jnp.abs(_rand(n, 3)) + 0.1)
    ref = stencil_jvp_xla(v, w, n)
    got = stencil_jvp_pallas(v, w, n, T=16)  # 4 row tiles: cross-tile halos
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_residual_kernel_vs_numpy_oracle():
    n = 32
    scale = 1e-3
    ui = jnp.abs(_rand(n, 4))
    res = bratu_residual_pallas(aligned_wrap(ui), n, scale, T=8)
    un = np.asarray(ui)
    up = np.pad(un, 1)
    oracle = (
        up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4 * un
        + scale * np.exp(un)
    )
    np.testing.assert_allclose(np.asarray(aligned_interior(res, n)), oracle, rtol=1e-12)


def test_ghost_invariant_preserved():
    """Output of the kernel is again a valid ghost-carrying array."""
    n = 32
    v = aligned_wrap(_rand(n, 5))
    w = aligned_wrap(jnp.abs(_rand(n, 6)))
    out = np.asarray(stencil_jvp_pallas(v, w, n, T=8))
    assert np.all(out[n:, :] == 0)
    assert np.all(out[:, 0] == 0)
    assert np.all(out[:, n + 1 :] == 0)


def test_aligned_residual_custom_jvp_consistent():
    """jax.jvp through residual_scaled_aligned (pallas path) matches the
    jacfwd of the standard residual on the interior."""
    n = 16
    p = bratu2d.default_config(n, lam=4.0)
    u0i = bratu2d.initial_guess(n)
    u0 = aligned_wrap(u0i)
    vi = _rand(n, 7)
    v = aligned_wrap(vi)

    _, jv = jax.jvp(lambda u: bratu2d.residual_scaled_aligned(u, p), (u0,), (v,))
    _, jv_ref = jax.jvp(lambda u: bratu2d.residual_scaled(u, p), (u0i,), (vi,))
    np.testing.assert_allclose(
        np.asarray(aligned_interior(jv, n)), np.asarray(jv_ref), atol=1e-10
    )


def test_end_to_end_solve_pallas_path():
    """Full JFNK through the aligned/pallas residual matches the standard
    path (CPU interpret mode)."""
    n = 32
    u0a, p, space = bratu2d.aligned_setup(n, lam=4.0, dtype=jnp.float64)
    u_a, info_a = newton_krylov_jit(
        lambda u, pp: bratu2d.residual_scaled_aligned(u, pp), u0a, p,
        algo="cg", space=space,
    )
    u_s, info_s = newton_krylov_jit(
        bratu2d.residual_scaled, bratu2d.initial_guess(n),
        bratu2d.default_config(n, 4.0), algo="cg",
    )
    assert bool(info_a.solved) and bool(info_s.solved)
    np.testing.assert_allclose(
        np.asarray(aligned_interior(u_a, n)), np.asarray(u_s), atol=1e-9
    )


def test_mixed_precision_refinement():
    """f64 state + f32 Krylov reaches f64-grade residuals (iterative
    refinement), where pure f32 floors out."""
    n = 64
    u0a, p, space = bratu2d.aligned_setup(n, lam=5.0, dtype=jnp.float64)
    u, info = newton_krylov_jit(
        lambda u, pp: bratu2d.residual_scaled_aligned(u, pp), u0a, p,
        algo="cg", tol_rel=1e-10, space=space, krylov_dtype=jnp.float32,
    )
    assert bool(info.solved)
    assert float(info.stats.n_res) < 1e-10 * 0.1  # far below f32 floor
    assert int(info.stats.outer_iterations) <= 15


def test_chain_probe_kernel_runs_and_is_finite():
    """The roofline probe (bench.py's speed-of-light calibration) must stay
    executable: same launch shape as the chain kernel, finite output, even-k
    contract enforced.  It is a measurement device, not a matvec — no value
    oracle beyond finiteness and the bounded-iteration scale."""
    from newtonkrylov_tpu.kernels.stencil2d import stencil_chain_probe_pallas

    n = 16
    v = aligned_wrap(_rand(n, 6))
    w = aligned_wrap(jnp.abs(_rand(n, 7)) + 0.1)
    out = stencil_chain_probe_pallas(v, w, n=n, k=4)
    assert out.shape == v.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    with pytest.raises(AssertionError):
        stencil_chain_probe_pallas(v, w, n=n, k=3)
