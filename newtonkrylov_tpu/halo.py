"""Halo-exchange domain decomposition over a TPU device mesh.

The reference's distribution story is a single-process *scaffold*: a
``HaloVector`` with a ghost ring whose ghosts are filled by local BC
functions (examples/halovector.jl:3-45, examples/heat_2D.jl:15-38), and
interior-masked Krylov reductions marking where global all-reduces would go
(examples/halovector.jl:51-74; SURVEY.md §2 "parallelism strategies").  This
module is the real thing, TPU-native:

* The global 2-D interior is sharded over a ``jax.sharding.Mesh``; each
  device holds a local block.  Solvers run *inside* ``shard_map`` as one
  SPMD program.
* Ghost fills become ``lax.ppermute`` neighbor exchanges over ICI
  (:func:`exchange_1d` / :func:`exchange_2d`); physical boundaries apply
  Dirichlet/periodic values exactly as the reference's ``bc_zero!`` /
  ``bc_periodic!`` did — but *communication* and *boundary condition* are now
  cleanly separated.
* All solver dot-products/norms go through
  :class:`~newtonkrylov_tpu.spaces.ShardedSpace`, whose reductions ``psum``
  over the mesh axes — the exact seam the reference marked with its
  ``kdot``/``knorm`` overrides (and with the interior off-by-one fixed:
  reductions here run over true interiors only).

Entry points: :func:`sharded_residual_2d` wraps a padded-block residual into
a shard_map-ready local residual; :func:`newton_krylov_sharded` runs the
whole Newton–Krylov solve as one SPMD XLA program over the mesh.

Multi-chip validation runs on a forced-host-device CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``) and via the driver's
``dryrun_multichip`` hook; the same code path targets real ICI on a pod
slice.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .newton import newton_krylov_jit
from .spaces import ShardedSpace

__all__ = [
    "make_mesh",
    "exchange_1d",
    "exchange_2d",
    "sharded_residual_1d",
    "sharded_residual_2d",
    "sharded_residual_df_2d",
    "newton_krylov_sharded",
    "integrate_scan_sharded",
    "shard_array",
]


def make_mesh(shape: Sequence[int], axis_names: Sequence[str] = ("i", "j"), devices=None) -> Mesh:
    """Build a mesh over the available devices (row-major)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if devices.size < n:
        raise ValueError(f"need {n} devices for mesh {tuple(shape)}, have {devices.size}")
    return Mesh(devices[:n].reshape(tuple(shape)), tuple(axis_names))


def shard_array(x, mesh: Mesh, spec: P):
    """Place a global array with the given partition spec."""
    return jax.device_put(x, NamedSharding(mesh, spec))


def _neighbor_ghosts(edge_lo, edge_hi, axis_name: str, bc: str):
    """Exchange the low/high edge slices with mesh neighbors along one axis.

    Returns (ghost_lo, ghost_hi): the values to place *outside* the local
    block — ghost_lo comes from the previous rank's high edge, ghost_hi from
    the next rank's low edge.  Periodic wrap rides the ppermute ring; for
    Dirichlet the outermost ranks overwrite their physical ghost with the BC
    value (zero), mirroring bc_zero!/bc_periodic! (examples/heat_2D.jl:15-38).
    """
    p = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % p) for i in range(p)]
    bwd = [(i, (i - 1) % p) for i in range(p)]
    ghost_lo = lax.ppermute(edge_hi, axis_name, fwd)   # from rank idx-1's high edge
    ghost_hi = lax.ppermute(edge_lo, axis_name, bwd)   # from rank idx+1's low edge
    if bc == "dirichlet":
        ghost_lo = jnp.where(idx == 0, jnp.zeros_like(ghost_lo), ghost_lo)
        ghost_hi = jnp.where(idx == p - 1, jnp.zeros_like(ghost_hi), ghost_hi)
    elif bc != "periodic":
        raise ValueError(f"unknown bc {bc!r}")
    return ghost_lo, ghost_hi


def exchange_1d(u, axis_name: str, bc: str = "dirichlet"):
    """Pad a local 1-D block with one ghost on each side via neighbor
    exchange (the distributed ghost fill of examples/bratu_ka.jl's stencil)."""
    ghost_lo, ghost_hi = _neighbor_ghosts(u[:1], u[-1:], axis_name, bc)
    return jnp.concatenate([ghost_lo, u, ghost_hi])


def exchange_2d(u, axis_names: Tuple[Optional[str], Optional[str]], bc: str = "dirichlet"):
    """Pad a local 2-D block with a one-cell ghost ring.

    ``axis_names`` gives the mesh axis sharding each array dimension (None =
    dimension not sharded → ghosts are pure BC values).  Corners are filled
    with zeros — 5-point stencils never read them (same property the
    reference exploits, examples/heat_2D.jl:45-62).
    """
    ax0, ax1 = axis_names
    nl, ml = u.shape
    dtype = u.dtype

    if ax0 is not None:
        g_lo, g_hi = _neighbor_ghosts(u[:1, :], u[-1:, :], ax0, bc)
    else:
        if bc == "dirichlet":
            g_lo = jnp.zeros((1, ml), dtype)
            g_hi = jnp.zeros((1, ml), dtype)
        else:
            g_lo, g_hi = u[-1:, :], u[:1, :]
    rows = jnp.concatenate([g_lo, u, g_hi], axis=0)

    if ax1 is not None:
        c_lo, c_hi = _neighbor_ghosts(u[:, :1], u[:, -1:], ax1, bc)
    else:
        if bc == "dirichlet":
            c_lo = jnp.zeros((nl, 1), dtype)
            c_hi = jnp.zeros((nl, 1), dtype)
        else:
            c_lo, c_hi = u[:, -1:], u[:, :1]
    zeros1 = jnp.zeros((1, 1), dtype)
    cols = jnp.concatenate(
        [jnp.concatenate([zeros1, c_lo, zeros1], axis=0),
         rows,
         jnp.concatenate([zeros1, c_hi, zeros1], axis=0)],
        axis=1,
    )
    # cols built by sandwiching: [ghost_col | rows | ghost_col]
    return cols


def sharded_residual_1d(padded_residual: Callable, axis_name: str, bc: str = "dirichlet") -> Callable:
    """Lift ``padded_residual(u_padded, p) -> res_local`` into a shard_map
    body: ghosts arrive by ICI exchange instead of jnp.pad."""

    def F(u, p):
        return padded_residual(exchange_1d(u, axis_name, bc), p)

    return F


def _ghosts_2d(u, axis_names, bc):
    """The four ghost strips (g_rlo, g_rhi: (1, ml); g_clo, g_chi: (nl, 1))."""
    ax0, ax1 = axis_names
    nl, ml = u.shape
    dtype = u.dtype
    if ax0 is not None:
        g_rlo, g_rhi = _neighbor_ghosts(u[:1, :], u[-1:, :], ax0, bc)
    elif bc == "dirichlet":
        g_rlo = jnp.zeros((1, ml), dtype)
        g_rhi = jnp.zeros((1, ml), dtype)
    else:
        g_rlo, g_rhi = u[-1:, :], u[:1, :]
    if ax1 is not None:
        g_clo, g_chi = _neighbor_ghosts(u[:, :1], u[:, -1:], ax1, bc)
    elif bc == "dirichlet":
        g_clo = jnp.zeros((nl, 1), dtype)
        g_chi = jnp.zeros((nl, 1), dtype)
    else:
        g_clo, g_chi = u[:, -1:], u[:, :1]
    return g_rlo, g_rhi, g_clo, g_chi


def sharded_residual_2d(
    padded_residual: Callable,
    axis_names: Tuple[Optional[str], Optional[str]],
    bc: str = "dirichlet",
    *,
    overlap: bool = True,
) -> Callable:
    """Lift ``padded_residual(u_padded, p) -> res_local`` (e.g. a 5-point
    stencil reading a (nl+2, ml+2) block) into a shard_map body.

    ``overlap=True`` (default) structures the dataflow so the *bulk* of the
    local compute is independent of the ppermute ghost exchange: the whole
    local block is evaluated immediately with zero ghosts (no collective on
    its path — pinned by tests/test_halo_overlap.py's DCE check), and only
    the four one-cell edge strips are re-evaluated once the neighbor edges
    arrive.  XLA's latency-hiding scheduler can then run the ICI exchange
    concurrently with the O(nl·ml) interior compute; the serialized ghost
    dependency is reduced to O(nl+ml) strip work (the overlap BASELINE.md's
    weak-scaling north star requires; SURVEY.md §5 "halo/domain axis").

    The overlapped path re-applies ``padded_residual`` to 3-row/3-column
    strips, so it requires a **radius-1 residual whose position dependence
    enters only through per-gridpoint fields in** ``p`` (leaves shaped like
    the local block are sliced to match each strip; scalars/odd-shaped
    leaves pass through).  Every shipped stencil problem qualifies.  For
    residuals that compute absolute position internally (e.g. from iota),
    pass ``overlap=False`` to get the plain exchange-then-compute
    formulation.
    """

    if not overlap:
        def F(u, p):
            return padded_residual(exchange_2d(u, axis_names, bc), p)

        return F

    def F(u, p):
        nl, ml = u.shape
        if nl < 2 or ml < 2:
            # edge strips would need second-neighbor ghosts; fall back
            return padded_residual(exchange_2d(u, axis_names, bc), p)
        g_rlo, g_rhi, g_clo, g_chi = _ghosts_2d(u, axis_names, bc)

        # Bulk: full local block with zero ghosts — NO collective dependency.
        bulk = padded_residual(jnp.pad(u, 1), p)

        def p_strip(r, c):
            """Slice per-gridpoint fields of p to a strip's footprint."""
            return jax.tree.map(
                lambda l: l[r, c]
                if hasattr(l, "shape") and getattr(l, "shape", None) == (nl, ml)
                else l,
                p,
            )

        full = slice(None)
        z1 = jnp.zeros((1, 1), u.dtype)

        # Each strip is a (1+2, ml+2) / (nl+2, 1+2) padded block whose single
        # interior row/col is the edge being re-evaluated with true ghosts.
        # Corners (ghost-row × ghost-col) are zeros — 5-point stencils never
        # read them (same property exchange_2d exploits).
        top = padded_residual(jnp.concatenate([
            jnp.concatenate([z1, g_clo[0:2]], 0),
            jnp.concatenate([g_rlo, u[0:2, :]], 0),
            jnp.concatenate([z1, g_chi[0:2]], 0),
        ], axis=1), p_strip(slice(0, 1), full))          # (1, ml)
        bot = padded_residual(jnp.concatenate([
            jnp.concatenate([g_clo[nl - 2:], z1], 0),
            jnp.concatenate([u[nl - 2:, :], g_rhi], 0),
            jnp.concatenate([g_chi[nl - 2:], z1], 0),
        ], axis=1), p_strip(slice(nl - 1, nl), full))    # (1, ml)
        left = padded_residual(jnp.concatenate([
            jnp.concatenate([z1, g_rlo[:, 0:2]], 1),
            jnp.concatenate([g_clo, u[:, 0:2]], 1),
            jnp.concatenate([z1, g_rhi[:, 0:2]], 1),
        ], axis=0), p_strip(full, slice(0, 1)))          # (nl, 1)
        right = padded_residual(jnp.concatenate([
            jnp.concatenate([g_rlo[:, ml - 2:], z1], 1),
            jnp.concatenate([u[:, ml - 2:], g_chi], 1),
            jnp.concatenate([g_rhi[:, ml - 2:], z1], 1),
        ], axis=0), p_strip(full, slice(ml - 1, ml)))    # (nl, 1)

        res = bulk.at[0, :].set(top[0])
        res = res.at[nl - 1, :].set(bot[0])
        res = res.at[:, 0].set(left[:, 0])
        res = res.at[:, ml - 1].set(right[:, 0])
        return res

    return F


def sharded_residual_df_2d(
    padded_df_residual: Callable,
    axis_names: Tuple[Optional[str], Optional[str]],
    bc: str = "dirichlet",
) -> Callable:
    """Lift a df32 padded-residual core into a shard_map body.

    ``padded_df_residual(up, u, p)`` takes the ghost-padded DF pair and the
    interior DF (e.g.
    :func:`~newtonkrylov_tpu.problems.bratu2d.residual_scaled_df_padded`).
    The hi and lo words are halo-exchanged separately — exchange is pure
    data movement, so the error-free two-sum chains see exactly the values
    a single device would, and the df32 acceptance residual stays exact
    under sharding.  Use as the ``residual_df`` of a
    ``newton_krylov_sharded`` solve.
    """
    from .df32 import DF

    def F(u_df, p):
        up = DF(exchange_2d(u_df.hi, axis_names, bc),
                exchange_2d(u_df.lo, axis_names, bc))
        return padded_df_residual(up, u_df, p)

    return F


def newton_krylov_sharded(
    F_local: Callable,
    u0,
    p: Any,
    mesh: Mesh,
    in_spec: P,
    *,
    axis_names: Optional[Sequence[str]] = None,
    newton_kwargs: Optional[dict] = None,
    p_spec: Optional[Any] = None,
    driver: Optional[Callable] = None,
):
    """Run a full Newton–Krylov solve as one SPMD program over ``mesh``.

    ``F_local`` is the per-device residual (build it with
    :func:`sharded_residual_2d`); ``u0`` the global initial state, sharded by
    ``in_spec``.  Every reduction inside the solver psums over
    ``axis_names`` (default: all mesh axes) via
    :class:`~newtonkrylov_tpu.spaces.ShardedSpace` — the TPU-native
    realization of the reference's overridden ``kdot``/``knorm`` seam.

    Returns ``(u, info)`` with ``u`` sharded like ``u0``.

    ``p`` is closed over, so array-valued parameters reach every device at
    *global* shape — fine for scalars/replicated data.  For per-gridpoint
    parameter fields pass ``p_spec`` (a pytree of PartitionSpecs congruent
    with ``p``) and the fields are sharded like the state instead.

    ``driver`` selects the whole-solve-in-one-program driver to shard:
    :func:`~newtonkrylov_tpu.newton.newton_krylov_jit` (default) or
    :func:`~newtonkrylov_tpu.continuation.pseudo_transient` — both return
    ``(u, NewtonInfo)`` and take ``space=``, so globalized Ψtc solves ride
    the identical SPMD wrapping (``newton_kwargs`` then carries the PTC
    options: ``delta0``, ``max_steps``, …).
    """
    axis_names = tuple(axis_names if axis_names is not None else mesh.axis_names)
    newton_kwargs = dict(newton_kwargs or {})
    space = ShardedSpace(axis_names=axis_names)
    if driver is None:
        driver = newton_krylov_jit

    scalar_spec = P()  # stats/history are identical on all devices
    info_specs = jax.tree.map(lambda _: scalar_spec, _info_structure())
    u0_sharded = shard_array(u0, mesh, in_spec)

    if p_spec is None:
        def local_solve(u0_local):
            return driver(F_local, u0_local, p, space=space, **newton_kwargs)

        wrapped = jax.shard_map(
            local_solve, mesh=mesh, in_specs=(in_spec,),
            out_specs=(in_spec, info_specs), check_vma=False,
        )
        return jax.jit(wrapped)(u0_sharded)

    def local_solve_p(u0_local, p_local):
        return driver(F_local, u0_local, p_local, space=space, **newton_kwargs)

    wrapped = jax.shard_map(
        local_solve_p, mesh=mesh, in_specs=(in_spec, p_spec),
        out_specs=(in_spec, info_specs), check_vma=False,
    )
    p_sharded = jax.tree.map(lambda leaf, spec: shard_array(leaf, mesh, spec), p, p_spec)
    return jax.jit(wrapped)(u0_sharded, p_sharded)


def _info_structure():
    """Pytree template matching NewtonInfo for out_specs construction."""
    from .newton import NewtonInfo, Stats

    return NewtonInfo(
        solved=0, stats=Stats(0, 0, 0.0), t=0.0, history=0.0, floor_limited=0
    )


def integrate_scan_sharded(
    stepper,
    f_local: Callable,
    u0,
    p: Any,
    dt: float,
    n_steps: int,
    mesh: Mesh,
    in_spec: P,
    *,
    t0: float = 0.0,
    axis_names: Optional[Sequence[str]] = None,
    tol_abs: float = 6.0e-6,
    newton_kwargs: Optional[dict] = None,
    p_spec: Optional[Any] = None,
    snapshot_every: Optional[int] = None,
):
    """Implicit time march over a sharded domain as one SPMD XLA program.

    ``f_local`` is the per-device ODE right-hand side (build its spatial
    operator with :func:`sharded_residual_2d`-style halo exchange);
    ``stepper`` is a :data:`~newtonkrylov_tpu.timestep.STEPPERS` key or
    builder.  Each step runs a whole Newton–Krylov solve with psum-backed
    reductions; ``lax.scan`` chains the steps.  Returns a
    :class:`~newtonkrylov_tpu.timestep.MarchResult`.

    ``p`` is closed over (global shape on every device) unless ``p_spec``
    (a pytree of PartitionSpecs congruent with ``p``) is given, in which
    case per-gridpoint parameter fields are sharded like the state — the
    same seam as :func:`newton_krylov_sharded`.  A df32 march passes
    ``newton_kwargs=dict(residual_df=...)`` with a per-word-exchanging df32
    step residual (:func:`~newtonkrylov_tpu.timestep.implicit_euler_df`
    over a :func:`sharded_residual_df_2d`-style RHS); the error-free
    two-sum chains see exactly the single-device values, so acceptance
    stays exact under sharding (tests/test_halo.py pins the parity).

    ``snapshot_every=k`` stacks every k-th state (sharded like ``u0``,
    leading time axis replicated) into ``history`` — device-resident, so
    size it to HBM; for long marches prefer
    :mod:`~newtonkrylov_tpu.utils.checkpointing`.  ``history=None`` when
    unset.  Step times are ``t0 + (k+1)·dt`` in the default float dtype;
    with x64 off, time-dependent RHS evaluation carries f32 rounding.
    """
    from .timestep import STEPPERS, MarchResult, StepParams

    if isinstance(stepper, str):
        stepper = STEPPERS[stepper]
    G = stepper(f_local)
    axis_names = tuple(axis_names if axis_names is not None else mesh.axis_names)
    newton_kwargs = dict(newton_kwargs or {})
    newton_kwargs.setdefault("tol_abs", tol_abs)
    space = ShardedSpace(axis_names=axis_names)
    fdtype = jnp.result_type(float)
    if snapshot_every is not None and snapshot_every < 1:
        raise ValueError("snapshot_every must be a positive int")

    def march_body(u0_local, p_local):
        def one_step(un, k):
            # k is int32 (exact far beyond 2^24, unlike a float counter)
            t = t0 + (k + 1).astype(fdtype) * dt
            sp = StepParams(un=un, dt=dt, p=p_local, t=t)
            u, info = newton_krylov_jit(G, un, sp, space=space, **newton_kwargs)
            return u, (info.solved, info.stats.outer_iterations,
                       info.stats.inner_iterations)

        if snapshot_every is None:
            ks = jnp.arange(n_steps, dtype=jnp.int32)
            return lax.scan(one_step, u0_local, ks)

        # Nested scan: the outer loop stacks ONE state per chunk, so HBM
        # holds n_steps // snapshot_every snapshots, not n_steps states.
        n_chunks, rem = divmod(n_steps, snapshot_every)

        def chunk(un, kc):
            ks = kc * snapshot_every + jnp.arange(snapshot_every,
                                                  dtype=jnp.int32)
            u_end, stats = lax.scan(one_step, un, ks)
            return u_end, (stats, u_end)

        u_fin, (cstats, snaps) = lax.scan(
            chunk, u0_local, jnp.arange(n_chunks, dtype=jnp.int32))
        stats = jax.tree.map(
            lambda a: a.reshape((n_chunks * snapshot_every,) + a.shape[2:]),
            cstats)
        if rem:
            ks = n_chunks * snapshot_every + jnp.arange(rem, dtype=jnp.int32)
            u_fin, rstats = lax.scan(one_step, u_fin, ks)
            stats = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                                 stats, rstats)
        return u_fin, (stats, snaps)

    scalar = P()
    stat_specs = (scalar, scalar, scalar)
    out_specs = (in_spec, stat_specs if snapshot_every is None
                 else (stat_specs, P(None, *in_spec)))
    u0_sharded = shard_array(u0, mesh, in_spec)
    if p_spec is None:
        # p closed over — scalar params keep their weak-typed Python
        # semantics (dx etc. stay compile-time constants)
        wrapped = jax.shard_map(
            lambda u0_local: march_body(u0_local, p),
            mesh=mesh, in_specs=(in_spec,), out_specs=out_specs,
            check_vma=False,
        )
        u_fin, out = jax.jit(wrapped)(u0_sharded)
    else:
        wrapped = jax.shard_map(
            march_body, mesh=mesh, in_specs=(in_spec, p_spec),
            out_specs=out_specs, check_vma=False,
        )
        p_in = jax.tree.map(lambda leaf, spec: shard_array(leaf, mesh, spec),
                            p, p_spec)
        u_fin, out = jax.jit(wrapped)(u0_sharded, p_in)
    if snapshot_every is None:
        (solved, outers, inners), history = out, None
    else:
        (solved, outers, inners), history = out
    return MarchResult(
        u=u_fin,
        history=history,
        ts=t0 + dt * jnp.arange(1, n_steps + 1),
        n_failed=jnp.sum(jnp.logical_not(solved)),
        outer_iterations=outers,
        inner_iterations=inners,
    )
