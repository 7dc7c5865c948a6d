"""Krylov solver correctness: random SPD/general systems vs numpy.linalg.solve,
preconditioning, restart, flexible GMRES, pytree states, termination semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import bicgstab, cg, cgls, fgmres, gmres
from newtonkrylov_tpu.solvers import available_algos, solve


def random_system(n, seed=0, spd=False, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    if spd:
        A = A @ A.T + n * np.eye(n)
    else:
        A = A + n * np.eye(n)  # well-conditioned, diagonally dominant-ish
    x_true = rng.standard_normal(n)
    b = A @ x_true
    return jnp.asarray(A, dtype), jnp.asarray(b, dtype), jnp.asarray(x_true, dtype)


def test_gmres_dense_exact():
    A, b, x_true = random_system(40, seed=1)
    res = gmres(lambda v: A @ v, b, restart=40, rtol=1e-12, atol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-8)


def test_gmres_restarted():
    A, b, x_true = random_system(60, seed=2, spd=True)
    res = gmres(lambda v: A @ v, b, restart=15, rtol=1e-10, atol=1e-12, itmax=600)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6)


def test_gmres_rtol_termination():
    """Stops at ‖r‖ ≤ atol + rtol·‖b‖, not earlier/later (inexact-Newton seam)."""
    A, b, x_true = random_system(50, seed=3)
    res = gmres(lambda v: A @ v, b, restart=50, rtol=1e-2, atol=0.0)
    r = b - A @ res.x
    assert float(jnp.linalg.norm(r)) <= 1e-2 * float(jnp.linalg.norm(b)) * (1 + 1e-10)
    # loose tolerance must not oversolve to machine precision
    assert int(res.niter) < 50


def test_gmres_mgs_matches_cgs2():
    A, b, _ = random_system(30, seed=4)
    r1 = gmres(lambda v: A @ v, b, restart=30, rtol=1e-10, orth="cgs2")
    r2 = gmres(lambda v: A @ v, b, restart=30, rtol=1e-10, orth="mgs")
    assert abs(int(r1.niter) - int(r2.niter)) <= 1
    np.testing.assert_allclose(r1.x, r2.x, rtol=1e-6)


def test_gmres_left_preconditioner():
    A, b, x_true = random_system(40, seed=5, spd=True)
    Minv = jnp.linalg.inv(A)  # perfect preconditioner
    res = gmres(lambda v: A @ v, b, M=lambda r: Minv @ r, restart=10, rtol=1e-10)
    assert bool(res.converged)
    assert int(res.niter) <= 2
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6)


def test_gmres_right_preconditioner():
    A, b, x_true = random_system(40, seed=6, spd=True)
    Minv = jnp.linalg.inv(A)
    res = gmres(lambda v: A @ v, b, N=lambda r: Minv @ r, restart=10, rtol=1e-10)
    assert bool(res.converged)
    assert int(res.niter) <= 2
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6)


def test_fgmres_nested_krylov_preconditioner():
    """FGMRES with an inner-GMRES preconditioner — the recipe of
    examples/bratu.jl:141-157 / examples/bvp.jl:30-38."""
    A, b, x_true = random_system(50, seed=7, spd=True)
    Aop = lambda v: A @ v

    def N(r):
        return gmres(Aop, r, restart=5, itmax=5, rtol=1e-1).x

    res = fgmres(Aop, b, N=N, restart=20, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-5)


def test_cg_spd():
    A, b, x_true = random_system(60, seed=8, spd=True)
    res = cg(lambda v: A @ v, b, rtol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-7)


def test_cg_jacobi_preconditioner():
    A, b, x_true = random_system(60, seed=9, spd=True)
    d = jnp.diag(A)
    res = cg(lambda v: A @ v, b, M=lambda r: r / d, rtol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-7)


def test_cg_pipelined_matches_plain():
    """Ghysels–Vanroose pipelined CG (one fused reduction round per inner,
    round 5): iteration counts and solutions match plain CG on SPD and
    negative-definite systems, preconditioned and not — the recurrences are
    the same Krylov process, only the reduction placement changes."""
    A, b, x_true = random_system(60, seed=8, spd=True)
    d = jnp.diag(A)
    for M in (None, lambda r: r / d):
        r_plain = cg(lambda v: A @ v, b, M=M, rtol=1e-12)
        r_pipe = cg(lambda v: A @ v, b, M=M, rtol=1e-12, pipeline=True)
        assert bool(r_pipe.converged)
        assert abs(int(r_pipe.niter) - int(r_plain.niter)) <= 2
        np.testing.assert_allclose(np.asarray(r_pipe.x), np.asarray(r_plain.x),
                                   atol=1e-8)
    # negative-definite mirror (the Bratu/heat stencil sign, cf. cg docstring)
    r_nd = cg(lambda v: -(A @ v), -b, rtol=1e-12, pipeline=True)
    assert bool(r_nd.converged)
    np.testing.assert_allclose(np.asarray(r_nd.x), x_true, rtol=1e-7)


def test_cg_pipelined_sharded_matches_single_device():
    """Sharded pipelined CG: one (3,)-psum per inner (the budget pin lives
    in test_scaling_structure); counts and solution must equal the
    single-device pipelined solve."""
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.halo import make_mesh, shard_array
    from newtonkrylov_tpu.spaces import ShardedSpace

    rng = np.random.default_rng(13)
    n = 64
    D = jnp.asarray(3.0 + rng.random(n))
    x_true = rng.standard_normal(n)
    op_global = lambda v: D * v  # noqa: E731
    b = op_global(jnp.asarray(x_true))

    r_ref = cg(op_global, b, rtol=1e-12, pipeline=True)

    mesh = make_mesh((8,), ("i",))
    space = ShardedSpace(("i",))
    nl = n // 8

    def op_local(v):
        k = jax.lax.axis_index("i")
        return jax.lax.dynamic_slice_in_dim(D, k * nl, nl) * v

    def solve_local(bl):
        r = cg(op_local, bl, rtol=1e-12, pipeline=True, space=space,
               itmax=200)
        return r.x, r.niter, r.converged

    f = jax.shard_map(
        solve_local, mesh=mesh, in_specs=(P("i"),),
        out_specs=(P("i"), P(), P()), check_vma=False,
    )
    x_sh, niter_sh, conv_sh = f(shard_array(b, mesh, P("i")))
    assert bool(conv_sh)
    assert int(niter_sh) == int(r_ref.niter)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(r_ref.x),
                               atol=1e-10)


def test_cg_pipelined_in_newton_driver():
    """pipeline=True flows through krylov_kwargs into the jit Newton driver
    and reproduces the plain-CG solve on 2-D Bratu."""
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u_a, i_a = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")
    u_b, i_b = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg",
                                 krylov_kwargs={"pipeline": True})
    assert bool(i_b.solved)
    assert abs(int(i_b.stats.inner_iterations)
               - int(i_a.stats.inner_iterations)) <= 3
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_a), atol=1e-9)


def test_bicgstab_general():
    A, b, x_true = random_system(40, seed=10)
    res = bicgstab(lambda v: A @ v, b, rtol=1e-10)
    assert bool(res.converged)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-5)


def test_cgls_least_squares():
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((50, 30)))
    x_true = jnp.asarray(rng.standard_normal(30))
    b = A @ x_true
    res = cgls(lambda v: A @ v, b, At=lambda w: A.T @ w, rtol=1e-12)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-6)


def test_pytree_state_gmres():
    A, b, x_true = random_system(32, seed=12, spd=True)

    def Aop(v):
        flat = jnp.concatenate([v["p"], v["q"]])
        out = A @ flat
        return {"p": out[:16], "q": out[16:]}

    bt = {"p": b[:16], "q": b[16:]}
    res = gmres(Aop, bt, restart=32, rtol=1e-11)
    assert bool(res.converged)
    np.testing.assert_allclose(jnp.concatenate([res.x["p"], res.x["q"]]), x_true, rtol=1e-7)


def test_zero_rhs_short_circuits():
    A, _, _ = random_system(10, seed=13)
    res = gmres(lambda v: A @ v, jnp.zeros(10))
    assert bool(res.converged)
    assert int(res.niter) == 0
    np.testing.assert_allclose(res.x, jnp.zeros(10))


def test_solvers_jittable():
    A, b, x_true = random_system(24, seed=14, spd=True)

    @jax.jit
    def run(bb):
        return gmres(lambda v: A @ v, bb, restart=24, rtol=1e-10).x

    np.testing.assert_allclose(run(b), x_true, rtol=1e-6)

    @jax.jit
    def run_cg(bb):
        return cg(lambda v: A @ v, bb, rtol=1e-10).x

    np.testing.assert_allclose(run_cg(b), x_true, rtol=1e-6)


def test_dispatch_menu():
    # cf. algo symbols exercised by the reference (src/Ariadne.jl:295 & examples)
    assert set(available_algos()) == {"gmres", "fgmres", "cg", "bicgstab", "cgls"}
    A, b, x_true = random_system(20, seed=15, spd=True)
    for algo in ["gmres", "fgmres", "cg", "bicgstab"]:
        res = solve(algo, lambda v: A @ v, b, rtol=1e-10)
        assert bool(res.converged), algo
        np.testing.assert_allclose(res.x, x_true, rtol=1e-4, err_msg=algo)


def test_gmres_restart_vs_full_parity_pin():
    """Pin iteration counts of restarted vs non-restarted GMRES (docs/parity.md).

    Krylov.jl's default is non-restarted; the Newton drivers therefore default
    to a single full cycle (newton._PARITY_GMRES_BASIS).  This pin catches the
    default drifting back to restarted semantics: on a 1-D Laplace system the
    two modes need visibly different iteration counts.
    """
    from newtonkrylov_tpu.newton import _PARITY_GMRES_BASIS

    n = 64
    main = jnp.full(n, -2.0, jnp.float64)
    b = jnp.sin(jnp.arange(n, dtype=jnp.float64))

    def Aop(v):
        return main * v + jnp.pad(v[1:], (0, 1)) + jnp.pad(v[:-1], (1, 0))

    full = gmres(Aop, b, restart=None, itmax=min(n, _PARITY_GMRES_BASIS), rtol=1e-10)
    restarted = gmres(Aop, b, restart=20, rtol=1e-10)
    assert bool(full.converged)
    # full GMRES on 1-D Laplace converges in exactly n steps (Krylov dim = n)
    assert int(full.niter) == n
    # GMRES(20) stagnates: exhausts itmax=2n over ceil(2n/20) cycles, unconverged
    assert not bool(restarted.converged)
    assert int(restarted.niter) == 140

    # the Newton drivers' default inner solve equals the non-restarted count
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.forcing import Fixed

    def F(u, p):
        return Aop(u) - b

    _, info_default = newton_krylov_jit(F, jnp.zeros(n), forcing=Fixed(1e-10))
    assert int(info_default.stats.outer_iterations) == 1
    assert int(info_default.stats.inner_iterations) == int(full.niter)
    _, info_restarted = newton_krylov_jit(
        F, jnp.zeros(n), forcing=Fixed(1e-10), krylov_kwargs={"restart": 20}
    )
    assert int(info_restarted.stats.inner_iterations) > int(full.niter)


def test_gmres_ortho_block_matches_unblocked():
    """Blocked CGS2 (ortho_block) is the same arithmetic chunked: identical
    iteration counts and solutions vs the full-basis sweep, for full and
    restarted modes, non-dividing block sizes, and masked spaces."""
    import numpy as np

    from newtonkrylov_tpu.spaces import MaskedSpace

    rng = np.random.default_rng(0)
    n = 120
    A = np.diag(3.0 + rng.random(n)) + 0.3 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)

    for restart, block in ((None, 16), (40, 16), (None, 7)):
        r_ref = gmres(lambda v: Aj @ v, b, restart=restart, itmax=200, rtol=1e-12)
        r_blk = gmres(lambda v: Aj @ v, b, restart=restart, itmax=200,
                      rtol=1e-12, ortho_block=block)
        assert bool(r_blk.converged)
        assert int(r_ref.niter) == int(r_blk.niter), (restart, block)
        np.testing.assert_allclose(np.asarray(r_blk.x), x_true, atol=1e-7)

    mask = jnp.ones(n).at[:3].set(0.0)
    sp = MaskedSpace(mask=mask)
    bm = b * mask
    op = lambda v: mask * (Aj @ (mask * v))  # noqa: E731
    r1 = gmres(op, bm, restart=None, itmax=200, rtol=1e-10, space=sp)
    r2 = gmres(op, bm, restart=None, itmax=200, rtol=1e-10, space=sp,
               ortho_block=16)
    assert int(r1.niter) == int(r2.niter)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-12)


def test_gmres_ortho_block_sharded_matches_single_device():
    """Blocked CGS2 under a ShardedSpace (round-5 lift of the round-4
    exclusion): chunk projections accumulate locally and one deferred psum
    per pass completes them — identical h, so counts and solutions match
    the single-device blocked solve exactly."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from newtonkrylov_tpu.halo import make_mesh, shard_array
    from newtonkrylov_tpu.spaces import ShardedSpace

    rng = np.random.default_rng(3)
    n = 64
    D = jnp.asarray(3.0 + rng.random(n))
    x_true = rng.standard_normal(n)
    op_global = lambda v: D * v + 0.1 * jnp.roll(v, 1)  # noqa: E731
    b = op_global(jnp.asarray(x_true))

    r_ref = gmres(op_global, b, restart=None, itmax=40, rtol=1e-12,
                  ortho_block=8)

    mesh = make_mesh((8,), ("i",))
    space = ShardedSpace(("i",))
    nl = n // 8

    def op_local(v):
        # local diag + the rolled coupling via a ppermute of the edge value
        full = jax.lax.all_gather(v, "i", tiled=True)
        rolled = jnp.roll(full, 1)
        k = jax.lax.axis_index("i")
        Dl = jax.lax.dynamic_slice_in_dim(D, k * nl, nl)
        return Dl * v + 0.1 * jax.lax.dynamic_slice_in_dim(rolled, k * nl, nl)

    def solve_local(bl):
        r = gmres(op_local, bl, restart=None, itmax=40, rtol=1e-12,
                  ortho_block=8, space=space)
        return r.x, r.niter, r.converged

    f = jax.shard_map(
        solve_local, mesh=mesh, in_specs=(P("i"),),
        out_specs=(P("i"), P(), P()), check_vma=False,
    )
    x_sh, niter_sh, conv_sh = f(shard_array(b, mesh, P("i")))
    assert bool(conv_sh)
    assert int(niter_sh) == int(r_ref.niter)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(r_ref.x),
                               atol=1e-10)


def test_fgmres_ortho_block_matches_unblocked():
    """FGMRES (flexible Z storage) composes with blocked CGS2 — Z rows are
    untouched by the blocking; counts and solutions match."""
    import numpy as np

    rng = np.random.default_rng(2)
    n = 80
    A = np.diag(3.0 + rng.random(n)) + 0.25 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    D = jnp.asarray(1.0 / np.diag(A))
    Nop = lambda v: D * v  # noqa: E731

    r_ref = fgmres(lambda v: Aj @ v, b, N=Nop, restart=None, itmax=120,
                   rtol=1e-12)
    r_blk = fgmres(lambda v: Aj @ v, b, N=Nop, restart=None, itmax=120,
                   rtol=1e-12, ortho_block=16)
    assert bool(r_blk.converged)
    assert int(r_ref.niter) == int(r_blk.niter)
    np.testing.assert_allclose(np.asarray(r_blk.x), x_true, atol=1e-7)


def test_cg_pipelined_itmax_edge_detection():
    """Review regression: convergence achieved exactly at k=itmax is
    detected by the post-loop exact-norm check (the in-loop detection
    lags one body), and resnorm is the true final residual."""
    A, b, x_true = random_system(60, seed=8, spd=True)
    r_full = cg(lambda v: A @ v, b, rtol=1e-12, pipeline=True)
    k_star = int(r_full.niter)
    r_edge = cg(lambda v: A @ v, b, rtol=1e-12, pipeline=True, itmax=k_star)
    assert int(r_edge.niter) == k_star
    assert bool(r_edge.converged)
    true_res = float(jnp.linalg.norm(b - A @ r_edge.x))
    assert abs(float(r_edge.residual) - true_res) <= 1e-9 * float(jnp.linalg.norm(b))
