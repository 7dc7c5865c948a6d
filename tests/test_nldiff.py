"""Quasilinear diffusion ∇·(D(u)∇u) (problems/nldiff2d.py).

The variable-coefficient-in-every-slot regime: the conservative flux
discretization makes all five Jacobian coefficient fields state-dependent,
which is exactly what probe_5point_general + precond.adi were built for —
and what no constant-coefficient factory can represent (the DST fails
outright here; recipe map in the module docstring, pinned below).
"""

import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import df32 as dd
from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.operator import JacobianOperator, materialize_dense
from newtonkrylov_tpu.precond import adi
from newtonkrylov_tpu.problems import nldiff2d

FULL = {"restart": None, "itmax": 200}


def test_manufactured_solution_is_discrete_root():
    n = 48
    p = nldiff2d.default_config(n, dtype=jnp.float64)
    us = nldiff2d.manufactured_solution(n, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(nldiff2d.residual_scaled(us, p)))) < 1e-14


def test_jacobian_varies_in_every_stencil_slot():
    """All five probed coefficient fields are genuinely state-dependent
    (non-constant), and nonsymmetric — the regime beyond convdiff (which
    varies only the antisymmetric convection part)."""
    from newtonkrylov_tpu.mg import probe_5point_general

    n = 12
    p = nldiff2d.default_config(n, dtype=jnp.float64)
    us = nldiff2d.manufactured_solution(n, dtype=jnp.float64) * 0.9
    J = JacobianOperator(lambda u, pp: nldiff2d.residual_scaled(u, pp), us, p)
    coeffs = probe_5point_general(J)
    for c in coeffs:
        interior = np.asarray(c)[2:-2, 2:-2]
        assert np.ptp(interior) > 0.1 * np.max(np.abs(interior))
    # probe exactness on this Jacobian (the densest variable-coefficient case)
    D = np.asarray(materialize_dense(J)).reshape(n, n, n, n)
    a0, aip, aim, ajp, ajm = coeffs
    for got, (di, dj) in [(a0, (0, 0)), (aip, (1, 0)), (aim, (-1, 0)),
                          (ajp, (0, 1)), (ajm, (0, -1))]:
        want = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    want[i, j] = D[i, j, ii, jj]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)
    # nonsymmetric: A[i, i+1] != A[i+1, i] where D' != 0
    asym = float(jnp.max(jnp.abs(aip[:-1, :] - aim[1:, :])))
    assert asym > 1e-3


def test_adi_counts_near_flat():
    """Pin the measured recipe: 7 outers, totals 43 → 49 → 55 for
    n = 32 → 64 → 128 (module docstring)."""
    caps = {32: 60, 64: 70, 128: 80}
    for n, cap in caps.items():
        p = nldiff2d.default_config(n, dtype=jnp.float64)
        u0 = nldiff2d.initial_guess(n, jnp.float64)
        u, info = newton_krylov_jit(
            nldiff2d.residual_scaled, u0, p, algo="gmres", tol_rel=1e-10,
            M=adi(4), forcing=None, max_niter=15, krylov_kwargs=dict(FULL))
        assert bool(info.solved)
        assert int(info.stats.inner_iterations) <= cap, (n, int(info.stats.inner_iterations))
        us = nldiff2d.manufactured_solution(n, dtype=jnp.float64)
        assert float(jnp.max(jnp.abs(u - us))) < 1e-9


def test_constant_coefficient_dst_fails_here():
    """The Laplacian-only DST mis-models the flux coefficients badly enough
    that GMRES cannot converge within budget (measured: 6001 inners,
    unsolved, at n = 64) — the negative recipe that motivates ADI."""
    n = 64
    p = nldiff2d.default_config(n, dtype=jnp.float64)
    u0 = nldiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        nldiff2d.residual_scaled, u0, p, algo="gmres", tol_rel=1e-10,
        M=fft_poisson(), forcing=None, max_niter=8,
        krylov_kwargs={"restart": None, "itmax": 400})
    assert not bool(info.solved)


def test_df32_residual_matches_f64_and_refines():
    n = 64
    p = nldiff2d.default_config(n, dtype=jnp.float64)
    us = nldiff2d.manufactured_solution(n, dtype=jnp.float64)
    x = us * 1.003 + 0.01
    want = nldiff2d.residual_scaled(x, p)
    got = dd.df_to_f64(nldiff2d.residual_scaled_df(dd.df_from_f64(x), p))
    rel = float(jnp.max(jnp.abs(got - want))) / float(jnp.max(jnp.abs(want)))
    assert rel < 1e-10, rel

    u0 = nldiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        nldiff2d.residual_scaled, u0, p, algo="gmres", tol_rel=1e-8,
        krylov_dtype=jnp.float32, residual_df=nldiff2d.residual_scaled_df,
        M=adi(4), forcing=None, max_niter=15, krylov_kwargs=dict(FULL))
    assert bool(info.solved)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-6


def test_sharded_nldiff_matches_single_device():
    """2×2 mesh with the per-gridpoint forcing sharded (p_spec): iteration
    counts and solution match single-device exactly (the flux coefficients
    at seams come from exchanged real-neighbor values), and block-ADI
    solves with the recorded Schwarz penalty."""
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.halo import (
        make_mesh, newton_krylov_sharded, sharded_residual_2d,
    )

    n = 32
    p = nldiff2d.default_config(n, dtype=jnp.float64)
    u0 = nldiff2d.initial_guess(n, jnp.float64)
    kwargs = dict(algo="gmres", tol_rel=1e-10, forcing=None, max_niter=15,
                  krylov_kwargs={"restart": None, "itmax": 200})

    u_ref, info_ref = newton_krylov_jit(nldiff2d.residual_scaled, u0, p,
                                        **kwargs)
    assert bool(info_ref.solved)

    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(nldiff2d.residual_scaled_padded,
                                  ("i", "j"), "dirichlet")
    # unpreconditioned parity (identical arithmetic, distributed)
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"), newton_kwargs=kwargs,
        p_spec=nldiff2d.Params(dx=P(), b=P("i", "j")))
    assert bool(info_sh.solved)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)

    # block-ADI on the quasilinear operator under shard_map
    u_adi, info_adi = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs=dict(kwargs, M=adi(4, axis_names=("i", "j"))),
        p_spec=nldiff2d.Params(dx=P(), b=P("i", "j")))
    assert bool(info_adi.solved)
    us = nldiff2d.manufactured_solution(n, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(u_adi - us))) < 1e-9


def test_mg_general_covers_nldiff():
    """The multilevel variable-coefficient factory handles the problem its
    scalar sibling provably cannot represent (module docstring): near-flat
    counts, exact manufactured root."""
    from newtonkrylov_tpu.mg import multigrid2d_general

    counts = {}
    for n in (32, 128):
        p = nldiff2d.default_config(n, dtype=jnp.float64)
        u0 = nldiff2d.initial_guess(n, jnp.float64)
        u, info = newton_krylov_jit(
            nldiff2d.residual_scaled, u0, p,
            algo="gmres", tol_rel=1e-10, M=multigrid2d_general(),
            forcing=None, max_niter=15,
            krylov_kwargs={"restart": None, "itmax": 300})
        assert bool(info.solved)
        counts[n] = int(info.stats.inner_iterations)
        us = nldiff2d.manufactured_solution(n, dtype=jnp.float64)
        assert float(jnp.max(jnp.abs(u - us))) < 1e-9
    # measured 39 -> 48 (docstring); bound with slack
    assert counts[128] <= 1.6 * counts[32], counts
