"""Nonsymmetric convection–diffusion problem (problems/convdiff2d.py).

The library's coverage of the non-SPD regime where GMRES is required
(reference recipe gallery /root/reference/examples/bratu.jl:110-157 shows
algo selection; every 2-D problem there is symmetric).  The manufactured
forcing makes u* = sin(πx)sin(πy) the *exact discrete root*, so solver
correctness is an equality check.  Recipe facts (counts, the c-regimes of
the two preconditioners) are measured in the module docstring; the tests
pin them.
"""

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from newtonkrylov_tpu import df32 as dd
from newtonkrylov_tpu import newton_krylov, newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.halo import make_mesh, newton_krylov_sharded, sharded_residual_2d
from newtonkrylov_tpu.operator import JacobianOperator, materialize_dense
from newtonkrylov_tpu.precond import adi, ilu0
from newtonkrylov_tpu.problems import convdiff2d

# Non-restarted GMRES: the DST-preconditioned spectrum carries a few
# h-growing outliers (module docstring); restarted GMRES cycles on them.
FULL_GMRES = {"restart": None, "itmax": 150}


def test_manufactured_solution_is_discrete_root():
    n = 48
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    r = convdiff2d.residual_scaled(us, p)
    assert float(jnp.max(jnp.abs(r))) < 1e-15


def test_jacobian_is_nonsymmetric():
    n = 12
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    J = materialize_dense(
        JacobianOperator(lambda u, pp: convdiff2d.residual_scaled(u, pp), us, p)
    )
    asym = float(jnp.max(jnp.abs(J - J.T)))
    scale = float(jnp.max(jnp.abs(J)))
    # central-difference convection contributes an O(c·dx·u) skew part
    assert asym > 1e-4 * scale


def test_gmres_dst_converges_to_manufactured():
    n = 64
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-10, M=fft_poisson(), forcing=None,
        krylov_kwargs=FULL_GMRES,
    )
    assert bool(info.solved)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-9


def test_gmres_dst_counts_match_measured_growth():
    """Pin the measured per-outer counts at c=2 (14 → 24 → 47 for
    n = 32 → 64 → 128, scipy-oracle-matched — module docstring).  Guards
    against solver regressions; the slow h-growth itself is the discrete
    operator's, not the solver's."""
    expected_max = {32: 70, 64: 110, 128: 210}
    for n, cap in expected_max.items():
        p = convdiff2d.default_config(n, dtype=jnp.float64)
        u0 = convdiff2d.initial_guess(n, jnp.float64)
        _, info = newton_krylov_jit(
            convdiff2d.residual_scaled, u0, p,
            algo="gmres", tol_rel=1e-10, M=fft_poisson(), forcing=None,
            krylov_kwargs=FULL_GMRES,
        )
        assert bool(info.solved)
        assert int(info.stats.outer_iterations) <= 5
        assert int(info.stats.inner_iterations) <= cap, (n, int(info.stats.inner_iterations))


def test_ilu_robust_when_convection_dominated():
    """c = 25 breaks the Laplacian preconditioner (spectrum straddles the
    origin); the reference's GMRES+ILU family (examples/bratu.jl:121-128)
    solves it from the zero start."""
    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-10, forcing=None,
        N=ilu0(offsets=(-n, -1, 0, 1, n)),
        krylov_kwargs={"restart": None, "itmax": 200},
    )
    assert bool(info.solved)
    assert int(info.stats.outer_iterations) <= 9
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-9


def test_adi_on_device_robust_when_convection_dominated():
    """c = 25 with the jitted driver and the ADI preconditioner — the
    convection-dominated regime solved *entirely on device* (no host
    callbacks), with totals well below host-ILU's ≈ 5·n growth
    (module docstring recipe map: 121 measured vs ILU's ≈ 320 at n = 64)."""
    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-10, M=adi(4), forcing=None,
        krylov_kwargs={"restart": None, "itmax": 200}, max_niter=15,
    )
    assert bool(info.solved)
    assert int(info.stats.outer_iterations) <= 9
    assert int(info.stats.inner_iterations) <= 160  # measured 121
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-9


def test_adi_counts_flat_at_moderate_convection():
    """At c = 2 ADI's totals are flatter than the DST's (18 → 21 → 24
    measured for n = 32 → 64 → 128 vs DST's 14 → 24 → 47)."""
    expected_max = {32: 30, 64: 35, 128: 40}
    for n, cap in expected_max.items():
        p = convdiff2d.default_config(n, dtype=jnp.float64)
        u0 = convdiff2d.initial_guess(n, jnp.float64)
        _, info = newton_krylov_jit(
            convdiff2d.residual_scaled, u0, p,
            algo="gmres", tol_rel=1e-10, M=adi(4), forcing=None,
            krylov_kwargs=FULL_GMRES,
        )
        assert bool(info.solved)
        assert int(info.stats.inner_iterations) <= cap, (n, int(info.stats.inner_iterations))


def test_probe_5point_general_exact_on_convdiff_jacobian():
    """The variable-coefficient probe recovers every coefficient field of
    the nonsymmetric Jacobian exactly (boundary couplings exactly zero)."""
    from newtonkrylov_tpu.mg import probe_5point_general

    n = 12
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    us = convdiff2d.manufactured_solution(n, jnp.float64) * 0.7
    J = JacobianOperator(lambda u, pp: convdiff2d.residual_scaled(u, pp), us, p)
    a0, aip, aim, ajp, ajm = probe_5point_general(J)
    D = np.asarray(materialize_dense(J)).reshape(n, n, n, n)

    def coef(di, dj):
        out = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    out[i, j] = D[i, j, ii, jj]
        return out

    for got, (di, dj) in [(a0, (0, 0)), (aip, (1, 0)), (aim, (-1, 0)),
                          (ajp, (0, 1)), (ajm, (0, -1))]:
        np.testing.assert_allclose(np.asarray(got), coef(di, dj), atol=1e-13)
    # boundary rows carry no outside coupling
    assert float(jnp.max(jnp.abs(aim[0, :]))) == 0.0
    assert float(jnp.max(jnp.abs(aip[-1, :]))) == 0.0


def test_df32_residual_matches_f64():
    rng = np.random.default_rng(11)
    n = 40
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    x = us * (1.0 + 1e-3) + jnp.asarray(rng.uniform(-1e-3, 1e-3, (n, n)))
    want = convdiff2d.residual_scaled(x, p)
    got = dd.df_to_f64(convdiff2d.residual_scaled_df(dd.df_from_f64(x), p))
    # ~2⁻⁴⁶ of the stencil operand scale; the residual itself is smaller
    # (partial cancellation near the root), so measure against it loosely
    denom = float(jnp.max(jnp.abs(want)))
    assert float(jnp.max(jnp.abs(got - want))) / denom < 1e-10


def test_refined_df32_solve_reaches_1e8():
    """f32 Krylov loop + df32 acceptance residual to ‖F‖ ≤ 1e-8·‖F₀‖ —
    the production mixed-precision path on a nonsymmetric operator."""
    n = 64
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-8, krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df,
        M=fft_poisson(), forcing=None, max_niter=25,
        krylov_kwargs=FULL_GMRES,
    )
    assert bool(info.solved)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-6


def test_sharded_solve_matches_single_device():
    """2×2 mesh, per-gridpoint forcing sharded via p_spec, overlapped halo
    exchange; iteration counts and solution must match the single-device
    solve (the residual is identical arithmetic, just distributed)."""
    n = 32
    p = convdiff2d.default_config(n, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    kwargs = dict(algo="gmres", tol_rel=1e-10, max_niter=20, forcing=None,
                  krylov_kwargs={"restart": None, "itmax": 100})

    u_ref, info_ref = newton_krylov_jit(convdiff2d.residual_scaled, u0, p, **kwargs)

    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(convdiff2d.residual_scaled_padded, ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs=kwargs,
        p_spec=convdiff2d.Params(dx=P(), c=P(), b=P("i", "j")),
    )
    assert bool(info_sh.solved)
    assert int(info_sh.stats.outer_iterations) == int(info_ref.stats.outer_iterations)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)


def test_block_adi_sharded_convection_dominated():
    """Block-ADI (additive-Schwarz line relaxation, zero communication per
    apply) solves c = 25 under shard_map; the Schwarz iteration-count
    penalty vs single-device ADI is recorded here (121 -> 189 measured on
    the 2x2 mesh at n = 64)."""
    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(convdiff2d.residual_scaled_padded,
                                  ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs=dict(algo="gmres", tol_rel=1e-10, forcing=None,
                           max_niter=15, M=adi(4, axis_names=("i", "j")),
                           krylov_kwargs={"restart": None, "itmax": 300}),
        p_spec=convdiff2d.Params(dx=P(), c=P(), b=P("i", "j")))
    assert bool(info_sh.solved)
    assert int(info_sh.stats.inner_iterations) <= 240  # measured 189
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u_sh - us))) < 1e-9


def test_block_adi_sharded_with_ortho_block_matches_unblocked():
    """The convection-regime traffic optimization now composes with
    sharding (VERDICT r4 next #3): GMRES + block-ADI with active-basis
    blocked CGS2 gives the SAME iteration counts and solution as the
    unblocked sharded solve — the deferred-psum completion is the same
    arithmetic (per-row dots are unchanged; only the reduction is
    batched)."""
    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(convdiff2d.residual_scaled_padded,
                                  ("i", "j"), "dirichlet")

    def run(extra_krylov):
        kk = {"restart": None, "itmax": 300, **extra_krylov}
        return newton_krylov_sharded(
            F_local, u0, p, mesh, P("i", "j"),
            newton_kwargs=dict(algo="gmres", tol_rel=1e-10, forcing=None,
                               max_niter=15, M=adi(4, axis_names=("i", "j")),
                               krylov_kwargs=kk),
            p_spec=convdiff2d.Params(dx=P(), c=P(), b=P("i", "j")))

    u_ref, info_ref = run({})
    u_blk, info_blk = run({"ortho_block": 32})
    assert bool(info_blk.solved)
    assert int(info_blk.stats.outer_iterations) == int(info_ref.stats.outer_iterations)
    assert int(info_blk.stats.inner_iterations) == int(info_ref.stats.inner_iterations)
    np.testing.assert_allclose(np.asarray(u_blk), np.asarray(u_ref), atol=1e-11)


def test_adi_composes_with_df32_refinement():
    """Regression: the ADI ρ-cycle must stay in the probe dtype — under x64
    a stray NumPy f64 scalar promoted every preconditioned Krylov vector to
    f64 and broke the f32-linearized JVP (round 4).  The production
    mixed-precision path (f32 Krylov + df32 acceptance) over ADI at c=25."""
    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-8, krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df,
        M=adi(4), forcing=None, max_niter=15,
        krylov_kwargs={"restart": None, "itmax": 300})
    assert bool(info.solved)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-6


def test_mg_general_counts_flat_in_resolution():
    """The multilevel answer to ADI's ~n^0.65 growth (VERDICT r4 next #2):
    variable-coefficient multigrid (general probe + per-level ADI line
    smoothing + upwind-clamped coarsening) holds convdiff c=25 totals
    within ~1.6x over 32 -> 256 where single-level ADI(4) grows 4.3x.
    Measured: 31 -> 42 -> 48 -> 51 (the docstring numbers)."""
    from newtonkrylov_tpu.mg import multigrid2d_general

    counts = {}
    for n in (32, 64, 128):
        p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
        u0 = convdiff2d.initial_guess(n, jnp.float64)
        u, info = newton_krylov_jit(
            convdiff2d.residual_scaled, u0, p,
            algo="gmres", tol_rel=1e-10, M=multigrid2d_general(),
            forcing=None, max_niter=15,
            krylov_kwargs={"restart": None, "itmax": 300})
        assert bool(info.solved)
        counts[n] = int(info.stats.inner_iterations)
        us = convdiff2d.manufactured_solution(n, jnp.float64)
        assert float(jnp.max(jnp.abs(u - us))) < 1e-9
    assert counts[128] <= 2.0 * counts[32], counts  # measured 48/31 = 1.55
    assert counts[128] <= 60, counts


def test_mg_general_composes_with_df32_refinement():
    """The production mixed-precision path over the multilevel factory:
    f32 Krylov loop + df32 acceptance at c=25."""
    from newtonkrylov_tpu.mg import multigrid2d_general

    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=1e-8, krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df,
        M=multigrid2d_general(), forcing=None, max_niter=15,
        krylov_kwargs={"restart": None, "itmax": 300})
    assert bool(info.solved)
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u - us))) < 1e-6


def test_block_mg_general_sharded():
    """Block-MG-ADI (additive Schwarz, zero communication per apply) under
    shard_map at c=25: the multilevel pod-scale shape; the Schwarz
    iteration-count penalty vs single-device is recorded here."""
    from newtonkrylov_tpu.mg import multigrid2d_general

    n = 64
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(convdiff2d.residual_scaled_padded,
                                  ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs=dict(
            algo="gmres", tol_rel=1e-10, forcing=None, max_niter=15,
            M=multigrid2d_general(axis_names=("i", "j")),
            krylov_kwargs={"restart": None, "itmax": 300}),
        p_spec=convdiff2d.Params(dx=P(), c=P(), b=P("i", "j")))
    assert bool(info_sh.solved)
    # single-device totals are 42 at this size; the local hierarchies see
    # only 32x32 blocks (2 levels at min_coarse=8), so the Schwarz penalty
    # lands near block-ADI's (189): recorded bound
    assert int(info_sh.stats.inner_iterations) <= 260
    us = convdiff2d.manufactured_solution(n, jnp.float64)
    assert float(jnp.max(jnp.abs(u_sh - us))) < 1e-9
