"""Overlapped halo exchange: correctness + dependency-structure tests.

``sharded_residual_2d(overlap=True)`` must (a) produce bit-identical values
to the exchange-then-compute formulation, and (b) keep the bulk local
compute OFF the ppermute data path, so XLA's latency-hiding scheduler can
run the ICI exchange concurrently with the interior stencil (BASELINE.md
north star; VERDICT r2 missing #2).  (b) is pinned by a forward dependency
closure over the shard_map body's jaxpr: the set of ops downstream of the
ppermutes must be the small edge-strip patchwork, not the full-block
stencil.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from newtonkrylov_tpu.halo import make_mesh, shard_array, sharded_residual_2d


def _padded_residual(up, p):
    """Translation-invariant 5-point stencil + nonlinearity (Bratu-like)."""
    u = up[1:-1, 1:-1]
    stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    return stencil + p * jnp.exp(u)


def _run(F_local, mesh, spec, u, p):
    f = jax.shard_map(
        lambda ul: F_local(ul, p), mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return np.asarray(jax.jit(f)(shard_array(u, mesh, spec)))


@pytest.mark.parametrize("bc", ["dirichlet", "periodic"])
@pytest.mark.parametrize("mesh_shape,axes", [
    ((2, 4), ("i", "j")),
    ((8,), ("i", None)),
])
def test_overlap_matches_plain_exchange(bc, mesh_shape, axes):
    names = tuple(a for a in axes if a is not None)
    mesh = make_mesh(mesh_shape, names)
    spec = P(*axes)
    rng = np.random.default_rng(0)
    n, m = 32, 32
    u = jnp.asarray(rng.standard_normal((n, m)))
    p = 0.37

    F_plain = sharded_residual_2d(_padded_residual, axes, bc, overlap=False)
    F_over = sharded_residual_2d(_padded_residual, axes, bc, overlap=True)
    r_plain = _run(F_plain, mesh, spec, u, p)
    r_over = _run(F_over, mesh, spec, u, p)
    # identical arithmetic; XLA fusion may reassociate at 1-ulp level
    np.testing.assert_allclose(r_over, r_plain, rtol=1e-14, atol=1e-14)


def test_overlap_matches_serial_oracle():
    """Sharded overlapped residual equals the single-array padded residual."""
    mesh = make_mesh((2, 2), ("i", "j"))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((16, 16)))
    p = 0.21
    oracle = np.asarray(_padded_residual(jnp.pad(u, 1), p))
    F_over = sharded_residual_2d(_padded_residual, ("i", "j"), "dirichlet")
    got = _run(F_over, mesh, P("i", "j"), u, p)
    np.testing.assert_allclose(got, oracle, rtol=1e-13, atol=1e-14)


def _ppermute_downstream_fraction(F_local, mesh, spec, u, p):
    """Work fraction (Σ output elements) data-dependent on a ppermute.

    Element counts proxy FLOPs: in the overlapped form only the edge strips
    and the final scatters hang off the exchange, so the downstream share
    collapses even though the strip patchwork adds many *small* eqns.
    """
    f = jax.shard_map(
        lambda ul: F_local(ul, p), mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    outer = jax.make_jaxpr(f)(u)

    def find_body(jaxpr):
        for eqn in jaxpr.eqns:
            for key in ("jaxpr", "call_jaxpr"):
                inner = eqn.params.get(key)
                if inner is None:
                    continue
                inner = getattr(inner, "jaxpr", inner)
                if any(e.primitive.name == "ppermute" for e in inner.eqns):
                    return inner
                deeper = find_body(inner)
                if deeper is not None:
                    return deeper
        return None

    body = find_body(outer.jaxpr)
    assert body is not None, "no ppermute found in traced program"

    from jax.extend import core as jex_core

    def work(eqn):
        return max(
            (int(np.prod(v.aval.shape)) for v in eqn.outvars if hasattr(v.aval, "shape")),
            default=1,
        )

    tainted = set()
    down = total = 0
    for eqn in body.eqns:
        total += work(eqn)
        invars = [v for v in eqn.invars if not isinstance(v, jex_core.Literal)]
        if eqn.primitive.name == "ppermute" or any(v in tainted for v in invars):
            tainted.update(eqn.outvars)
            if eqn.primitive.name != "ppermute":
                down += work(eqn)
    return down / max(1, total)


def test_bulk_compute_independent_of_ppermute():
    mesh = make_mesh((2, 4), ("i", "j"))
    spec = P("i", "j")
    u = jnp.ones((32, 32))
    p = 0.37
    frac_plain = _ppermute_downstream_fraction(
        sharded_residual_2d(_padded_residual, ("i", "j"), overlap=False),
        mesh, spec, u, p)
    frac_over = _ppermute_downstream_fraction(
        sharded_residual_2d(_padded_residual, ("i", "j"), overlap=True),
        mesh, spec, u, p)
    # plain: the entire stencil consumes the exchanged block → most eqns
    # downstream.  overlapped: only edge strips + 4 scatters are.
    assert frac_plain > 0.5, frac_plain
    assert frac_over < 0.5 * frac_plain, (frac_over, frac_plain)
