"""Vector spaces: where reductions (and therefore collectives) live.

The reference's distribution seam is Krylov.jl's vector-primitive overrides:
``kdot``/``knorm`` looping over the *interior* of a halo array
(``examples/halovector.jl:51-74``) are exactly the points where a multi-device
build inserts a global reduction, and ``kref!``/``kaxpy!`` are pure elementwise
updates that need no communication.  This module makes that seam explicit:

* :class:`EuclideanSpace` — dense pytree state, plain reductions.
* :class:`MaskedSpace` — reductions weighted by a 0/1 interior mask, so ghost
  cells never contribute (fixing the reference's interior off-by-one, where the
  loops ``1:(mx-1)`` include the high ghost row — ``examples/halovector.jl:56-61``).
* :class:`ShardedSpace` — a masked space whose scalar reductions are followed
  by ``jax.lax.psum`` over mesh axes; used inside ``shard_map`` bodies where
  every leaf is a local shard.

Solvers take a ``space`` argument and perform *all* dots/norms through it;
elementwise updates stay raw tree ops (no communication required).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from .tree import tree_norm, tree_project_rows, tree_vdot

__all__ = ["VectorSpace", "EuclideanSpace", "MaskedSpace", "ShardedSpace", "default_space"]


class VectorSpace:
    """Reduction protocol for solver inner products."""

    def dot(self, x, y):
        raise NotImplementedError

    def norm(self, x):
        return jnp.sqrt(self.dot(x, x).real)

    def project_rows(self, V, w):
        """<V[j], w> for all rows j of a stacked basis → (m,) vector."""
        raise NotImplementedError

    def dot2(self, x1, y1, x2, y2):
        """(<x1,y1>, <x2,y2>) as one (2,)-reduction.

        Two *independent* inner products fused into a single reduction
        round: under sharding the stacked pair rides ONE psum (a (2,)
        allreduce has the same tree latency as a scalar one), so a solver
        that needs both — e.g. CG's post-update ``‖r‖`` and ``<r, z>`` —
        pays one latency instead of two.  Thin alias of :meth:`dot_stack`.
        """
        return self.dot_stack([(x1, y1), (x2, y2)])

    def dot_stack(self, pairs):
        """k independent inner products as one (k,)-reduction round.

        The general fused round — pipelined CG stacks its three
        per-iteration scalars through it (``solvers.cg(pipeline=True)``):
        a (k,) allreduce has the same tree latency as a scalar one, so
        ALL of an iteration's scalars cost one round.  ``pairs``:
        iterable of ``(x, y)`` pytrees.
        """
        return jnp.stack([self.dot(x, y) for x, y in pairs])

    def mask_tree(self, x):
        """Zero out entries that do not belong to the space (ghost cells)."""
        return x

    def reduce_rows(self, h):
        """Complete a vector of LOCALLY-accumulated inner products.

        The seam that lets blocked orthogonalization defer its reduction:
        chunked basis projections accumulate into a full-length ``h``
        locally (plain ``tree_project_rows`` per chunk, no communication),
        then this completes ALL of them in one shot — identity here, a
        single psum under :class:`ShardedSpace`.  One reduction round per
        CGS2 pass regardless of chunk count, same budget as the unblocked
        ``project_rows`` (tests/test_scaling_structure.py pins it).
        """
        return h

    def size_multiplier(self):
        """Global size = local tree_size × this.  1 except under sharding;
        solvers use it for iteration-count defaults (itmax = 2·global size —
        inside shard_map a local tree_size would silently truncate itmax)."""
        return 1


@dataclasses.dataclass(frozen=True)
class EuclideanSpace(VectorSpace):
    """Plain ℓ² space over all pytree entries."""

    def dot(self, x, y):
        return tree_vdot(x, y)

    def norm(self, x):
        return tree_norm(x)

    def project_rows(self, V, w):
        return tree_project_rows(V, w)


@dataclasses.dataclass(frozen=True)
class MaskedSpace(VectorSpace):
    """Interior-masked ℓ² space.

    ``mask`` is a pytree congruent with the state whose entries are 1 on the
    interior and 0 on ghosts.  Reductions are mask-weighted, mirroring (and
    correcting) the interior-only loops of ``examples/halovector.jl:51-74``.
    """

    mask: Any

    def dot(self, x, y):
        mx = self.mask_tree(x)
        return tree_vdot(mx, y)

    def project_rows(self, V, w):
        mw = self.mask_tree(w)
        return tree_project_rows(V, mw)

    def mask_tree(self, x):
        # cast the mask, not the operand: mixed-precision solves run f32
        # Krylov vectors against an f64-state mask
        return jax.tree.map(lambda m, l: m.astype(l.dtype) * l, self.mask, x)


@dataclasses.dataclass(frozen=True)
class ShardedSpace(VectorSpace):
    """Masked space + psum over mesh axes: the distributed reduction point.

    Use inside a ``shard_map`` body.  ``axis_names`` are the mesh axes the
    state is sharded over; scalar reductions are all-reduced across them via
    ICI collectives.  ``mask`` may be None (fully-interior local shards with
    separate halo buffers) or a local interior mask.
    """

    axis_names: Sequence[str]
    mask: Any = None

    def _local(self):
        return MaskedSpace(self.mask) if self.mask is not None else EuclideanSpace()

    def dot(self, x, y):
        return jax.lax.psum(self._local().dot(x, y), tuple(self.axis_names))

    def project_rows(self, V, w):
        return jax.lax.psum(self._local().project_rows(V, w), tuple(self.axis_names))

    def dot_stack(self, pairs):
        # dot2 rides through here (base-class alias): local dots stacked,
        # ONE psum completes them all
        loc = self._local()
        stacked = jnp.stack([loc.dot(x, y) for x, y in pairs])
        return jax.lax.psum(stacked, tuple(self.axis_names))

    def mask_tree(self, x):
        return self._local().mask_tree(x)

    def reduce_rows(self, h):
        return jax.lax.psum(h, tuple(self.axis_names))

    def size_multiplier(self):
        mult = 1
        for ax in self.axis_names:
            mult = mult * jax.lax.psum(1, ax)
        return mult


def default_space() -> VectorSpace:
    return EuclideanSpace()
