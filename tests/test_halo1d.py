"""1-D halo-exchange sharding (BASELINE config 5: multi-partition Bratu with
halo-exchange stencil JVP) + host-driver mixed-precision parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from newtonkrylov_tpu import newton_krylov, newton_krylov_jit
from newtonkrylov_tpu.halo import (
    exchange_1d,
    make_mesh,
    newton_krylov_sharded,
    shard_array,
    sharded_residual_1d,
)
from newtonkrylov_tpu.problems import bratu1d

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def bratu1d_padded(yp, p):
    """Scaled 1-D Bratu residual reading a (nl+2,) padded block."""
    y = yp[1:-1]
    return (yp[2:] - 2.0 * y + yp[:-2]) + (p.dx * p.dx) * p.lam * jnp.exp(y)


def test_exchange_1d_matches_pad():
    mesh = make_mesh((8,), ("i",))
    n = 64
    u = jnp.asarray(np.random.default_rng(0).standard_normal(n))

    body = lambda ul: exchange_1d(ul, "i", "dirichlet")
    padded = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("i"),), out_specs=P("i"),
                      check_vma=False)
    )(shard_array(u, mesh, P("i")))
    blocks = np.asarray(padded).reshape(8, 10)
    ref = np.asarray(jnp.pad(u, 1))
    for b in range(8):
        np.testing.assert_allclose(blocks[b], ref[b * 8 : b * 8 + 10], atol=1e-14)


def test_sharded_bratu1d_matches_single_device():
    """The bratu_ka/halovector configuration, done with real collectives."""
    n = 1024
    p = bratu1d.default_config(n, lam=3.0)
    u0 = bratu1d.initial_guess(n)

    u_ref, info_ref = newton_krylov_jit(bratu1d.residual_scaled, u0, p, algo="cg")
    assert bool(info_ref.solved)

    mesh = make_mesh((8,), ("i",))
    F_local = sharded_residual_1d(bratu1d_padded, "i", "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i"), newton_kwargs={"algo": "cg"},
    )
    assert bool(info_sh.solved)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-10)
    assert int(info_sh.stats.inner_iterations) == int(info_ref.stats.inner_iterations)


def test_host_driver_mixed_precision_matches_jit():
    """newton_krylov with krylov_dtype matches newton_krylov_jit."""
    n = 256
    p = bratu1d.default_config(n, lam=3.0)
    u0 = bratu1d.initial_guess(n)  # f64 under the test config

    u1, i1 = newton_krylov(
        bratu1d.residual_scaled, u0, p, algo="cg", krylov_dtype=jnp.float32
    )
    u2, i2 = newton_krylov_jit(
        bratu1d.residual_scaled, u0, p, algo="cg", krylov_dtype=jnp.float32
    )
    assert i1.solved and bool(i2.solved)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-12)
    assert i1.stats.outer_iterations == int(i2.stats.outer_iterations)
    assert i1.stats.inner_iterations == int(i2.stats.inner_iterations)
    # reaches f64-grade residual despite f32 inner loop
    assert i1.stats.n_res < 1e-9
