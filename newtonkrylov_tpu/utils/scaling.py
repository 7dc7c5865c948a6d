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

import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..halo import exchange_2d, make_mesh, shard_array

__all__ = ["ScalingPoint", "weak_scaling_matvec"]


class ScalingPoint(NamedTuple):
    n_devices: int
    global_n: int
    matvecs_per_s: float
    efficiency: float  # vs the 1-device per-device rate


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

    Each device holds a ``local_n × local_n`` block (row decomposition);
    the matvec includes the ppermute ghost exchange — the communication the
    efficiency number is about.
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

        def chain_local(v, wl):
            out = lax.fori_loop(0, chain, lambda i, x: matvec_local(x, wl) * 0.125, v)
            return lax.psum(jnp.sum(out), "i")

        run = jax.jit(
            jax.shard_map(
                chain_local, mesh=mesh,
                in_specs=(P("i", None), P("i", None)),
                out_specs=P(),
                check_vma=False,
            )
        )
        us = shard_array(u, mesh, P("i", None))
        ws = shard_array(w, mesh, P("i", None))
        float(run(us, ws))  # compile
        best = float("inf")
        for r in range(repeats):
            us_r = shard_array(u * (1.0 + 1e-4 * (r + 1)), mesh, P("i", None))
            t0 = time.perf_counter()
            float(run(us_r, ws))
            best = min(best, time.perf_counter() - t0)
        rate = chain / best  # global matvecs/s (each matvec covers d blocks)
        per_device = rate  # weak scaling: ideal = constant rate as d grows
        if base_rate is None:
            base_rate = per_device
        points.append(
            ScalingPoint(
                n_devices=d,
                global_n=n_rows,
                matvecs_per_s=rate,
                efficiency=per_device / base_rate,
            )
        )
    return points
