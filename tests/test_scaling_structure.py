"""Communication-topology regression tests (VERDICT r1 weak #6).

Weak-scaling *numbers* on virtual CPU devices are contention-bound, so the
thing worth pinning in CI is the STRUCTURE: a sharded matvec must lower to a
fixed, mesh-size-independent number of collectives, and sharded reductions
to exactly one psum.  If a refactor accidentally introduces an all_gather
(replicating the global state) or an extra exchange, these counts change.
"""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from newtonkrylov_tpu.halo import exchange_2d, make_mesh
from newtonkrylov_tpu.spaces import ShardedSpace
from newtonkrylov_tpu.utils.scaling import _stencil_jvp_local


def _collective_counts(jaxpr_text):
    return {
        name: len(re.findall(rf"\b{name}\b", jaxpr_text))
        for name in ("ppermute", "psum", "all_gather", "all_to_all")
    }


def _matvec_jaxpr(mesh, spec, axes):
    def matvec_local(v, wl):
        vp = exchange_2d(v, axes, "dirichlet")
        return _stencil_jvp_local(vp, wl)

    f = jax.shard_map(
        matvec_local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    n = 16 * mesh.devices.shape[0]
    m = 16 * (mesh.devices.shape[1] if mesh.devices.ndim > 1 else 1)
    u = jnp.ones((n, m), jnp.float32)
    return str(jax.make_jaxpr(f)(u, u))


@pytest.mark.parametrize("d", [2, 4, 8])
def test_1d_exchange_collective_count_mesh_independent(d):
    mesh = make_mesh((d,), ("i",))
    counts = _collective_counts(_matvec_jaxpr(mesh, P("i", None), ("i", None)))
    # one ppermute per neighbor direction, independent of mesh size
    assert counts["ppermute"] == 2, counts
    assert counts["all_gather"] == 0 and counts["all_to_all"] == 0, counts


def test_2d_exchange_collective_count():
    mesh = make_mesh((2, 4), ("i", "j"))
    counts = _collective_counts(_matvec_jaxpr(mesh, P("i", "j"), ("i", "j")))
    assert counts["ppermute"] == 4, counts  # ±rows over i, ±cols over j
    assert counts["all_gather"] == 0 and counts["all_to_all"] == 0, counts


def test_sharded_norm_is_one_psum():
    mesh = make_mesh((8,), ("i",))
    space = ShardedSpace(("i",))

    def norm_local(v):
        return space.norm(v)

    f = jax.shard_map(
        norm_local, mesh=mesh, in_specs=(P("i", None),), out_specs=P(),
        check_vma=False,
    )
    txt = str(jax.make_jaxpr(f)(jnp.ones((64, 16), jnp.float32)))
    counts = _collective_counts(txt)
    assert counts["psum"] == 1, counts
    assert counts["all_gather"] == 0, counts


def test_sharded_dot_is_one_psum():
    mesh = make_mesh((8,), ("i",))
    space = ShardedSpace(("i",))

    f = jax.shard_map(
        lambda a, b: space.dot(a, b), mesh=mesh,
        in_specs=(P("i", None), P("i", None)), out_specs=P(),
        check_vma=False,
    )
    x = jnp.ones((64, 16), jnp.float32)
    counts = _collective_counts(str(jax.make_jaxpr(f)(x, x)))
    assert counts["psum"] == 1, counts
    assert counts["all_gather"] == 0, counts


def test_full_solve_per_inner_collective_counts():
    """Pin the MEASURED per-Krylov-inner-iteration collective budget of the
    three production sharded configurations (benchmarks/collectives.py →
    SCALING_r04.json).  These are the numbers the scaling model's
    amortization terms are fed with — a refactor that adds an exchange, an
    all_gather, or an extra reduction per inner iteration changes them."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    try:
        from collectives import collective_counts_by_level, config_traceable
    finally:
        sys.path.pop(0)

    mesh = make_mesh((4, 2), ("i", "j"))
    expected = {
        # matvec exchange = 4 ppermutes; CG = 2 psums (pAp, then the
        # fused post-update (||r||^2, <r,z>) pair via space.dot2)
        "cg_plain": {"ppermute": 4, "psum": 2},
        # pipelined (Ghysels–Vanroose) CG: ONE fused (3,)-psum per inner,
        # data-independent of the matvec/preconditioner so it can hide
        "cg_pipelined": {"ppermute": 4, "psum": 1},
        # + degree x 4 exchange rounds inside the Chebyshev apply,
        # ZERO extra reductions — the communication-avoiding shape
        "cg_cheb16": {"ppermute": 4 + 16 * 4, "psum": 2},
        # block-MG: strong preconditioning at ZERO added collectives
        # (each device V-cycles its local block)
        "cg_block_mg": {"ppermute": 4, "psum": 2},
        # + 4 tiled reduce-scatters per global-DST apply, no all_gather
        "production_dst_df32": {"ppermute": 4, "psum": 2, "psum_scatter": 4},
    }
    for name, want in expected.items():
        fn, args = config_traceable(name, mesh, 32)
        levels = collective_counts_by_level(fn, *args)
        per_inner = levels[2]
        assert per_inner == want, (name, per_inner)
        for lvl in levels.values():
            assert "all_gather" not in lvl and "all_to_all" not in lvl, (name, levels)


def test_sharded_ortho_block_budget_unchanged():
    """Blocked CGS2 under a ShardedSpace keeps the unblocked psum budget
    (VERDICT r4 next #3): GMRES's per-inner level (while depth 3 — Newton →
    restart cycle → Arnoldi step) is 4 ppermutes (matvec exchange) + 3
    psums (two projection passes + the new-column norm), with chunk
    projections accumulated LOCALLY and completed by ONE deferred psum per
    pass — so the chunk loop itself (while depth 4, data-dependent trip
    count) must contain ZERO collectives."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    try:
        from collectives import collective_counts_by_level, config_traceable
    finally:
        sys.path.pop(0)

    mesh = make_mesh((4, 2), ("i", "j"))
    fn, args = config_traceable("gmres_adi_blocked", mesh, 32)
    levels = collective_counts_by_level(fn, *args)
    assert levels[3] == {"ppermute": 4, "psum": 3}, levels
    assert not levels.get(4), levels  # chunk loop: collective-free
    for lvl in levels.values():
        assert "all_gather" not in lvl and "all_to_all" not in lvl, levels
