"""Multi-device halo-exchange tests on the 8-virtual-CPU-device mesh — the
fake-backend tier the reference lacks (SURVEY.md §4c).

The key correctness property: a sharded solve must produce bit-comparable
results (same solution, same iteration counts) to the single-device solve of
the same global problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.halo import (
    exchange_2d,
    make_mesh,
    newton_krylov_sharded,
    shard_array,
    sharded_residual_2d,
)
from newtonkrylov_tpu.problems import bratu2d

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")


def bratu2d_padded(up, p):
    """Scaled 2-D Bratu residual reading a padded block (ghosts included)."""
    u = up[1:-1, 1:-1]
    stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    return stencil + (p.dx * p.dx) * p.lam * jnp.exp(u)


def test_exchange_2d_matches_pad():
    """On a mesh, gathered exchange_2d ghosts equal the jnp.pad ghosts of the
    global array (interior rows/cols; corners are unread)."""
    mesh = make_mesh((2, 2), ("i", "j"))
    n = 16
    rng = np.random.default_rng(0)
    u_global = jnp.asarray(rng.standard_normal((n, n)))

    def body(u_local):
        return exchange_2d(u_local, ("i", "j"), "dirichlet")

    padded_local = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P("i", "j"),),
            out_specs=P("i", "j"), check_vma=False,
        )
    )(shard_array(u_global, mesh, P("i", "j")))
    # padded_local is (2*(8+2), 2*(8+2)) globally: pull each block and check
    blocks = np.asarray(padded_local).reshape(2, 10, 2, 10).transpose(0, 2, 1, 3)
    ref = np.asarray(jnp.pad(u_global, 1))
    for bi in range(2):
        for bj in range(2):
            blk = blocks[bi, bj]
            gref = ref[bi * 8 : bi * 8 + 10, bj * 8 : bj * 8 + 10]
            # interior + edge ghosts must match; corners may differ (unread)
            np.testing.assert_allclose(blk[1:-1, :], gref[1:-1, :], atol=1e-14)
            np.testing.assert_allclose(blk[:, 1:-1], gref[:, 1:-1], atol=1e-14)


def test_exchange_2d_periodic():
    mesh = make_mesh((2, 2), ("i", "j"))
    n = 8
    u_global = jnp.arange(n * n, dtype=jnp.float64).reshape(n, n)

    def body(u_local):
        return exchange_2d(u_local, ("i", "j"), "periodic")

    padded = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("i", "j"),),
                      out_specs=P("i", "j"), check_vma=False)
    )(shard_array(u_global, mesh, P("i", "j")))
    blocks = np.asarray(padded).reshape(2, 6, 2, 6).transpose(0, 2, 1, 3)
    ref = np.asarray(jnp.pad(u_global, 1, mode="wrap"))
    for bi in range(2):
        for bj in range(2):
            blk = blocks[bi, bj]
            gref = ref[bi * 4 : bi * 4 + 6, bj * 4 : bj * 4 + 6]
            np.testing.assert_allclose(blk[1:-1, :], gref[1:-1, :], atol=1e-14)
            np.testing.assert_allclose(blk[:, 1:-1], gref[:, 1:-1], atol=1e-14)


def test_sharded_bratu2d_matches_single_device():
    """The flagship parity check: sharded JFNK == single-device JFNK,
    solution and iteration counts."""
    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)

    # single-device reference
    u_ref, info_ref = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")
    assert bool(info_ref.solved)

    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(bratu2d_padded, ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"), newton_kwargs={"algo": "cg"},
    )
    assert bool(info_sh.solved)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)
    assert int(info_sh.stats.outer_iterations) == int(info_ref.stats.outer_iterations)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)


def test_sharded_gmres_path():
    """GMRES (stacked-basis) also runs under shard_map with psum reductions."""
    n = 16
    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n)
    u_ref, info_ref = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="gmres",
        krylov_kwargs={"restart": 40},
    )
    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(bratu2d_padded, ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs={"algo": "gmres", "krylov_kwargs": {"restart": 40}},
    )
    assert bool(info_sh.solved)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-8)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)


def test_1d_row_sharding_8way():
    """8-way 1-D decomposition (rows) of the 2-D problem."""
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)
    u_ref, info_ref = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")

    mesh = make_mesh((8,), ("i",))
    F_local = sharded_residual_2d(bratu2d_padded, ("i", None), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", None), newton_kwargs={"algo": "cg"},
    )
    assert bool(info_sh.solved)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-9)
    assert int(info_sh.stats.outer_iterations) == int(info_ref.stats.outer_iterations)


def test_sharded_time_march_matches_single_device():
    """Implicit heat march over a sharded domain (halo exchange every matvec)
    reproduces the single-device integrate_scan exactly."""
    from newtonkrylov_tpu.halo import integrate_scan_sharded
    from newtonkrylov_tpu.ops.stencil import laplacian_2d
    from newtonkrylov_tpu.problems import heat2d
    from newtonkrylov_tpu.timestep import integrate_scan

    n = 32
    p = heat2d.default_config(n)
    dt = heat2d.stable_dt(p)
    u0 = heat2d.initial_condition(n)

    r_ref = integrate_scan("euler", heat2d.rhs, u0, p, dt, 10,
                           newton_kwargs={"algo": "cg"})

    mesh = make_mesh((2, 2), ("i", "j"))

    def f_local(u, pp, t):
        up = exchange_2d(u, ("i", "j"), "dirichlet")
        return pp.a * laplacian_2d(up, pp.dx, pp.dy)

    r_sh = integrate_scan_sharded(
        "euler", f_local, u0, p, dt, 10, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg"},
    )
    assert int(r_sh.n_failed) == 0
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u), atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(r_sh.inner_iterations), np.asarray(r_ref.inner_iterations)
    )


def test_sharded_parameter_fields_p_spec():
    """Per-gridpoint parameter fields sharded alongside the state (p_spec)."""
    n = 16
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(1.0 + 0.5 * rng.random((n, n)))  # spatially varying

    def F_global(u, p):
        c = p["coeff"]
        up = jnp.pad(u, 1)
        stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
        return stencil + 0.01 * c * jnp.exp(u)

    u0 = jnp.zeros((n, n))
    u_ref, info_ref = newton_krylov_jit(F_global, u0, {"coeff": coeff}, algo="cg")
    assert bool(info_ref.solved)

    def padded_local(up, p):
        u = up[1:-1, 1:-1]
        stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
        return stencil + 0.01 * p["coeff"] * jnp.exp(u)

    mesh = make_mesh((2, 2), ("i", "j"))
    F_local = sharded_residual_2d(padded_local, ("i", "j"), "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, {"coeff": coeff}, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg"},
        p_spec={"coeff": P("i", "j")},
    )
    assert bool(info_sh.solved)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-10)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)


def test_sharded_df32_time_march_matches_single_device():
    """df32 implicit march under shard_map (VERDICT r3 next #6): per-word
    halo exchange inside the df32 step residual — acceptance arithmetic is
    identical to single-device, so counts and states must match exactly."""
    from newtonkrylov_tpu import df32 as dd
    from newtonkrylov_tpu.halo import integrate_scan_sharded
    from newtonkrylov_tpu.ops.stencil import laplacian_2d
    from newtonkrylov_tpu.problems import heat2d
    from newtonkrylov_tpu.timestep import implicit_euler_df, integrate_scan

    n = 32
    p = heat2d.default_config(n)
    dt = heat2d.stable_dt(p)
    u0 = heat2d.initial_condition(n)
    kwargs_ref = {"algo": "cg", "tol_rel": 1e-8,
                  "residual_df": implicit_euler_df(heat2d.rhs_df)}
    r_ref = integrate_scan("euler", heat2d.rhs, u0, p, dt, 8,
                           newton_kwargs=kwargs_ref)
    assert int(r_ref.n_failed) == 0

    mesh = make_mesh((2, 2), ("i", "j"))
    axes = ("i", "j")

    def f_local(u, pp, t):
        up = exchange_2d(u, axes, "dirichlet")
        return pp.a * laplacian_2d(up, pp.dx, pp.dy)

    def f_df_local(u, pp, t=None):
        up = dd.DF(exchange_2d(u.hi, axes, "dirichlet"),
                   exchange_2d(u.lo, axes, "dirichlet"))
        return heat2d.rhs_df_padded(up, u, pp, t)

    r_sh = integrate_scan_sharded(
        "euler", f_local, u0, p, dt, 8, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg", "tol_rel": 1e-8,
                       "residual_df": implicit_euler_df(f_df_local)},
    )
    assert int(r_sh.n_failed) == 0
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u),
                               atol=1e-13)
    np.testing.assert_array_equal(
        np.asarray(r_sh.inner_iterations), np.asarray(r_ref.inner_iterations))


def test_sharded_march_p_spec_parameter_fields():
    """Per-gridpoint parameter fields in the sharded march (p_spec): a
    spatially varying diffusivity field sharded like the state."""
    from newtonkrylov_tpu.halo import integrate_scan_sharded
    from newtonkrylov_tpu.timestep import integrate_scan

    n = 16
    rng = np.random.default_rng(7)
    cfield = jnp.asarray(0.005 + 0.005 * rng.random((n, n)), jnp.float32)
    dx = 1.0 / (n + 1)

    def rhs_global(u, pp, t=None):
        up = jnp.pad(u, 1)
        lap = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2]
               - 4.0 * u) / (dx * dx)
        return pp["c"] * lap

    X = jnp.linspace(dx, 1 - dx, n)
    u0 = (jnp.sin(jnp.pi * X)[:, None] * jnp.sin(jnp.pi * X)[None, :]).astype(
        jnp.float32)
    dt = 0.1 * dx * dx / 0.01
    r_ref = integrate_scan("euler", rhs_global, u0, {"c": cfield}, dt, 5,
                           newton_kwargs={"algo": "cg"})
    assert int(r_ref.n_failed) == 0

    mesh = make_mesh((2, 2), ("i", "j"))

    def rhs_local(u, pp, t=None):
        up = exchange_2d(u, ("i", "j"), "dirichlet")
        lap = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2]
               - 4.0 * u) / (dx * dx)
        return pp["c"] * lap

    r_sh = integrate_scan_sharded(
        "euler", rhs_local, u0, {"c": cfield}, dt, 5, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg"},
        p_spec={"c": P("i", "j")},
    )
    assert int(r_sh.n_failed) == 0
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u),
                               atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(r_sh.inner_iterations), np.asarray(r_ref.inner_iterations))


def test_sharded_march_snapshot_history():
    """snapshot_every stacks every k-th state, sharded like u0; matches the
    single-device history rows at the same steps (incl. a remainder tail)."""
    from newtonkrylov_tpu.halo import integrate_scan_sharded
    from newtonkrylov_tpu.ops.stencil import laplacian_2d
    from newtonkrylov_tpu.problems import heat2d
    from newtonkrylov_tpu.timestep import integrate_scan

    n = 16
    p = heat2d.default_config(n)
    dt = heat2d.stable_dt(p)
    u0 = heat2d.initial_condition(n)
    n_steps, every = 7, 3  # 2 full chunks + remainder of 1

    r_ref = integrate_scan("euler", heat2d.rhs, u0, p, dt, n_steps,
                           newton_kwargs={"algo": "cg"})

    mesh = make_mesh((2, 2), ("i", "j"))

    def f_local(u, pp, t):
        up = exchange_2d(u, ("i", "j"), "dirichlet")
        return pp.a * laplacian_2d(up, pp.dx, pp.dy)

    r_sh = integrate_scan_sharded(
        "euler", f_local, u0, p, dt, n_steps, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg"}, snapshot_every=every,
    )
    assert int(r_sh.n_failed) == 0
    assert r_sh.history.shape == (n_steps // every, n, n)
    # history rows are the states after steps `every` and `2*every`
    np.testing.assert_allclose(np.asarray(r_sh.history[0]),
                               np.asarray(r_ref.history[every - 1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.history[1]),
                               np.asarray(r_ref.history[2 * every - 1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u),
                               atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(r_sh.inner_iterations), np.asarray(r_ref.inner_iterations))
