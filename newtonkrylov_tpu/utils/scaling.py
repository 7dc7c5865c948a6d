"""Weak/strong-scaling measurement harness.

BASELINE.md's north star includes ≥90% weak-scaling matvec efficiency from
1 chip to N hosts.  This harness measures halo-exchange stencil-JVP
throughput over device meshes of increasing size — weak scaling grows the
global domain with the mesh so each device keeps a constant local block.

On a single-chip or CPU environment it runs over virtual host devices
(``--xla_force_host_platform_device_count``), which validates the
communication structure (collective count, overlap) rather than ICI
bandwidth; on a pod slice the identical code measures the real thing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..halo import exchange_2d, make_mesh, shard_array
from .profiling import time_chain

__all__ = ["ScalingPoint", "weak_scaling_matvec", "weak_scaling_matvec_2d"]


class ScalingPoint(NamedTuple):
    n_devices: int
    global_n: int
    matvecs_per_s: float
    efficiency: float  # vs the smallest measured mesh (= 1 device when included)


def _stencil_jvp_local(up, w):
    u = up[1:-1, 1:-1]
    lap = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    return lap + w * u


def weak_scaling_matvec(
    local_n: int = 512,
    device_counts: Optional[Sequence[int]] = None,
    chain: int = 200,
    repeats: int = 3,
    dtype=jnp.float32,
) -> list[ScalingPoint]:
    """Measure halo-exchange stencil-JVP throughput per mesh size.

    Each device holds a ``local_n × local_n`` block (row decomposition); the
    matvec includes the ppermute ghost exchange — the communication the
    efficiency number is about.  Under weak scaling the ideal global rate is
    constant as devices grow, so ``efficiency = rate_d / rate_first``;
    **include 1 in device_counts** to anchor against the BASELINE
    1-chip-to-N target — with a partial list the baseline is the smallest
    measured mesh and earlier scaling loss is invisible.  Timing uses the
    overhead-cancelling :func:`~newtonkrylov_tpu.utils.profiling.time_chain`.
    """
    ndev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]

    points = []
    base_rate = None
    for d in device_counts:
        mesh = make_mesh((d,), ("i",))
        n_rows = local_n * d
        u = jnp.ones((n_rows, local_n), dtype)
        w = jnp.ones((n_rows, local_n), dtype) * 0.1

        def matvec_local(v, wl):
            vp = exchange_2d(v, ("i", None), "dirichlet")
            return _stencil_jvp_local(vp, wl)

        spec = P("i", None)
        matvec_global = jax.shard_map(
            matvec_local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
            check_vma=False,
        )
        us = shard_array(u, mesh, spec)
        ws = shard_array(w, mesh, spec)
        rate = time_chain(matvec_global, us, ws, chain=chain, repeats=repeats)
        if base_rate is None:
            base_rate = rate
        points.append(
            ScalingPoint(
                n_devices=d,
                global_n=n_rows,
                matvecs_per_s=rate,
                efficiency=rate / base_rate,
            )
        )
    return points


def weak_scaling_matvec_2d(
    local_n: int = 512,
    mesh_shape: tuple = (2, 4),
    chain: int = 200,
    repeats: int = 3,
    dtype=jnp.float32,
) -> ScalingPoint:
    """One weak-scaling point over a 2-D ``(i, j)`` device mesh.

    Both grid dimensions are sharded, so the ghost exchange runs 4 ppermutes
    (±rows over ``i``, ±cols over ``j``) — the communication topology of a
    pod-slice domain decomposition where the 2-D mesh keeps ICI hops
    nearest-neighbor.
    """
    di, dj = mesh_shape
    mesh = make_mesh((di, dj), ("i", "j"))
    u = jnp.ones((local_n * di, local_n * dj), dtype)
    w = jnp.ones((local_n * di, local_n * dj), dtype) * 0.1

    def matvec_local(v, wl):
        vp = exchange_2d(v, ("i", "j"), "dirichlet")
        return _stencil_jvp_local(vp, wl)

    spec = P("i", "j")
    matvec_global = jax.shard_map(
        matvec_local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    us = shard_array(u, mesh, spec)
    ws = shard_array(w, mesh, spec)
    rate = time_chain(matvec_global, us, ws, chain=chain, repeats=repeats)
    return ScalingPoint(
        n_devices=di * dj,
        global_n=local_n * di,
        matvecs_per_s=rate,
        efficiency=float("nan"),  # single point; caller anchors it
    )
