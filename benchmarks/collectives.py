"""Measured per-solve collective budget on the virtual device mesh
(VERDICT r3 next #2: "measure the sharded communication budget instead of
modeling it").

For each production-relevant sharded configuration this module traces the
FULL ``newton_krylov_sharded`` program (the same jaxpr the driver's
multichip dryrun executes) and counts every collective equation by
while-loop nesting level:

* level 0 — once per solve (setup: probing, preconditioner build),
* level 1 — once per Newton outer iteration (acceptance residual,
  forcing, direction add),
* level 2 — once per Krylov inner iteration (matvec exchange,
  preconditioner apply, solver dots/norms).

``lax.fori_loop``/``lax.scan`` bodies with static trip counts multiply
into their enclosing level (a Chebyshev(16) apply contributes its 16
exchanges to level 2), so the numbers are the *actual* per-iteration
collective counts of the compiled program — not a model.  Totals per
solve combine the static counts with the measured outer/inner iteration
counts of an executed solve on the same mesh.

Primitive-name notes (jax 0.8): ``lax.psum`` traces as ``psum_invariant``
(one equation per call, regardless of how many mesh axes it reduces —
reported here as ``psum``), ``lax.psum_scatter`` as ``reduce_scatter``,
and one ``lax.ppermute`` call with k (src, dst) pairs is ONE equation
(reported as ``ppermute``; the 2-D halo exchange issues 4 calls).

Run: ``python benchmarks/collectives.py`` inside an
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` process (or let
``run_scaling.py`` spawn it) → JSON on the last line, embedded into
SCALING_r04.json.
"""

from __future__ import annotations

import collections
import json

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

COLLECTIVES = {
    "ppermute": "ppermute",
    "psum_invariant": "psum",
    "psum": "psum",
    "reduce_scatter": "psum_scatter",
    "all_gather": "all_gather",
    "all_to_all": "all_to_all",
}


def collective_counts_by_level(traceable, *args) -> dict:
    """{while_nesting_level: {collective_name: count}} for the traced fn.

    Static-trip-count loops (``scan``, and ``fori_loop`` which lowers to
    ``scan``) multiply their body counts into the enclosing level; only
    data-dependent ``while`` loops start a new level.
    """
    import jax.extend.core as jex

    closed = jax.make_jaxpr(traceable)(*args)
    acc: dict = collections.defaultdict(collections.Counter)

    def walk(jaxpr, mult, level):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name in COLLECTIVES:
                acc[level][COLLECTIVES[name]] += mult
            if name == "while":
                walk(eqn.params["body_jaxpr"].jaxpr, mult, level + 1)
                walk(eqn.params["cond_jaxpr"].jaxpr, mult, level + 1)
            elif name == "scan":
                walk(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"], level)
            else:
                for v in eqn.params.values():
                    for vv in v if isinstance(v, (tuple, list)) else (v,):
                        if isinstance(vv, jex.ClosedJaxpr):
                            walk(vv.jaxpr, mult, level)
                        elif hasattr(vv, "eqns"):
                            walk(vv, mult, level)

    walk(closed.jaxpr, 1, 0)
    return {lvl: dict(cnt) for lvl, cnt in sorted(acc.items())}


# ---------------------------------------------------------------------------
# The sharded configurations: VERDICT r3 next #2's three, plus block-MG
# (round 4's zero-added-communication middle ground).
# ---------------------------------------------------------------------------

def _bratu_setup(n):
    from newtonkrylov_tpu.problems import bratu2d

    p = bratu2d.default_config(n, lam=4.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float32)

    def padded_residual(up, pp):
        u = up[1:-1, 1:-1]
        stencil = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:]
                   + up[1:-1, :-2] - 4.0 * u)
        return stencil + (pp.dx * pp.dx) * pp.lam * jnp.exp(u)

    return p, u0, padded_residual


def config_traceable(name: str, mesh, n: int):
    """(traceable, args): the full sharded solve as one traceable program.

    Mirrors ``halo.newton_krylov_sharded``'s wrapping exactly (shard_map of
    the jitted driver with a ShardedSpace), so the traced jaxpr is the
    program the driver executes.
    """
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.halo import (
        _info_structure, shard_array, sharded_residual_2d,
        sharded_residual_df_2d,
    )
    from newtonkrylov_tpu.newton import newton_krylov_jit
    from newtonkrylov_tpu.precond import chebyshev
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.spaces import ShardedSpace

    p, u0, padded_residual = _bratu_setup(n)
    axes = ("i", "j")
    F_local = sharded_residual_2d(padded_residual, axes, "dirichlet")
    space = ShardedSpace(axis_names=axes)

    # tol_rel 2e-3 is the pure-f32 regime's reachable target at this size
    # (entry()'s rationale); the production config refines to 1e-6 via df32.
    kwargs = {"algo": "cg", "max_niter": 12, "tol_rel": 2e-3, "space": space}
    if name == "cg_plain":
        pass
    elif name == "cg_pipelined":
        # Ghysels–Vanroose pipelined CG: ONE fused (3,)-psum per inner
        # (vs plain CG's 2 rounds), data-independent of the matvec +
        # preconditioner so the scheduler can hide it — the small-block
        # latency-regime recipe (VERDICT r4 next #4)
        kwargs["krylov_kwargs"] = {"pipeline": True}
    elif name == "cg_cheb16":
        kwargs["M"] = chebyshev(degree=16, axis_names=axes)
    elif name == "cg_block_mg":
        # zero-communication strong preconditioning: block-MG adds NO
        # collectives over plain CG — the additive-Schwarz design point
        from newtonkrylov_tpu.mg import multigrid2d

        kwargs["M"] = multigrid2d(axis_names=axes)
    elif name == "production_dst_df32":
        F_df_local = sharded_residual_df_2d(
            bratu2d.residual_scaled_df_padded, axes, "dirichlet")
        kwargs.update(
            M=fft_poisson(axis_names=axes, scope="global", precision="high"),
            precond_refresh="once", residual_df=F_df_local, tol_rel=1e-6,
        )
    elif name == "gmres_adi_blocked":
        # the convection-regime recipe (GMRES + block-ADI) with active-basis
        # blocked CGS2: chunk projections accumulate locally, ONE deferred
        # psum per pass completes them (spaces.reduce_rows) — the chunk loop
        # itself (while_depth 4) must be collective-free
        from newtonkrylov_tpu.precond import adi

        kwargs.update(
            algo="gmres", M=adi(2, axis_names=axes), forcing=None,
            krylov_kwargs={"restart": None, "itmax": 64, "ortho_block": 16},
        )
    else:
        raise ValueError(name)

    def local_solve(u0_local):
        u, info = newton_krylov_jit(F_local, u0_local, p, **kwargs)
        return u, info

    spec = P("i", "j")
    info_specs = jax.tree.map(lambda _: P(), _info_structure())
    wrapped = jax.shard_map(local_solve, mesh=mesh, in_specs=(spec,),
                            out_specs=(spec, info_specs), check_vma=False)
    u0_sh = shard_array(u0, mesh, spec)
    return wrapped, (u0_sh,)


CONFIGS = ("cg_plain", "cg_pipelined", "cg_cheb16", "cg_block_mg",
           "production_dst_df32", "gmres_adi_blocked")
LEVEL_LABELS = {0: "per_solve_setup", 1: "per_newton_outer", 2: "per_krylov_inner"}


def measure(n: int = 64, mesh_shape=(4, 2)) -> dict:
    """Static per-level counts + measured iterations + per-solve totals."""
    from newtonkrylov_tpu.halo import make_mesh

    mesh = make_mesh(mesh_shape, ("i", "j"))
    out = {}
    for name in CONFIGS:
        fn, args = config_traceable(name, mesh, n)
        levels = collective_counts_by_level(fn, *args)
        u, info = jax.jit(fn)(*args)
        outer = int(info.stats.outer_iterations)
        inner = int(info.stats.inner_iterations)
        totals = collections.Counter()
        for lvl, cnt in levels.items():
            # GMRES nests one extra while (restart cycles): level 2 runs
            # once per cycle ≈ once per outer under restart=None, and the
            # per-inner level is 3 (the blocked-ortho chunk loop at depth 4
            # is collective-free — pinned in tests/test_scaling_structure).
            if name.startswith("gmres"):
                mult = {0: 1, 1: outer, 2: outer}.get(lvl, inner)
            else:
                mult = {0: 1, 1: outer}.get(lvl, inner)
            for k, v in cnt.items():
                totals[k] += mult * v
        out[name] = {
            "levels": {LEVEL_LABELS.get(lvl, f"while_depth_{lvl}"): cnt
                       for lvl, cnt in levels.items()},
            "measured_iters": {"outer": outer, "inner": inner,
                               "solved": bool(info.solved)},
            "totals_per_solve": dict(totals),
        }
    return out


def main():
    # sitecustomize consumes JAX_PLATFORMS before user code; force CPU the
    # supported way (must happen before first backend use).
    jax.config.update("jax_platforms", "cpu")
    res = {
        "mesh": "4x2 (8 virtual devices)", "global_n": 64,
        "note": ("static collective counts per while-nesting level of the "
                 "traced production sharded-solve jaxpr, combined with the "
                 "measured iteration counts of the executed solve"),
        "configs": measure(),
    }
    print("RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
