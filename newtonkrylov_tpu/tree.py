"""Pytree vector-space primitives.

The reference delegates BLAS-1 vector operations to Krylov.jl's ``kdot`` /
``knorm`` / ``kaxpy!`` / ... hooks (consumed at ``src/Ariadne.jl:317-338`` and
overridden for halo vectors at ``examples/halovector.jl:48-147``).  In a
TPU-native functional design the state ``u`` is an arbitrary JAX pytree, so the
same seam becomes a small set of pure tree-map reductions/updates.  Global
reductions (`tree_vdot`, `tree_norm`) are exactly the points where a sharded
vector space inserts a ``psum`` — see :mod:`newtonkrylov_tpu.spaces`.

All functions are jit/vmap/grad-safe and dtype-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "tree_vdot",
    "tree_norm",
    "tree_add",
    "tree_sub",
    "tree_scale",
    "tree_axpy",
    "tree_axpby",
    "tree_zeros_like",
    "tree_ones_like",
    "tree_where",
    "tree_size",
    "tree_dtype",
    "tree_stack_like",
    "tree_get_row",
    "tree_set_row",
    "tree_basis_combine",
    "tree_project_rows",
]


def tree_vdot(x, y):
    """<x, y> summed over every leaf (f64/f32 accumulation per leaf dtype)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.vdot(a, b), x, y))
    return jnp.sum(jnp.stack(leaves)) if len(leaves) > 1 else leaves[0]


def tree_norm(x):
    """Euclidean norm over the whole tree."""
    return jnp.sqrt(tree_vdot(x, x).real)


def tree_add(x, y):
    return jax.tree.map(jnp.add, x, y)


def tree_sub(x, y):
    return jax.tree.map(jnp.subtract, x, y)


def tree_scale(a, x):
    return jax.tree.map(lambda l: a * l, x)


def tree_axpy(a, x, y):
    """y + a*x  (functional kaxpy, cf. examples/halovector.jl:92-103)."""
    return jax.tree.map(lambda xl, yl: yl + a * xl, x, y)


def tree_axpby(a, x, b, y):
    """a*x + b*y (functional kaxpby, cf. examples/halovector.jl:105-117)."""
    return jax.tree.map(lambda xl, yl: a * xl + b * yl, x, y)


def tree_zeros_like(x):
    return jax.tree.map(jnp.zeros_like, x)


def tree_ones_like(x):
    return jax.tree.map(jnp.ones_like, x)


def tree_where(pred, x, y):
    """Select whole tree x or y on a scalar predicate (jit-safe branch merge)."""
    return jax.tree.map(lambda xl, yl: jnp.where(pred, xl, yl), x, y)


def tree_size(x) -> int:
    """Total number of scalar entries (static)."""
    return sum(l.size for l in jax.tree.leaves(x))


def tree_dtype(x):
    """dtype of the first leaf (solvers assume a homogeneous tree)."""
    return jnp.result_type(*[l.dtype for l in jax.tree.leaves(x)])


# -- Stacked Krylov bases ----------------------------------------------------
#
# A Krylov basis of (max) dimension m over pytree states is stored as the same
# pytree with an extra leading axis of length m on every leaf.  This keeps each
# basis vector contiguous in HBM and turns Gram-Schmidt projections into single
# large contractions (MXU-friendly) instead of per-vector loops — the TPU-native
# answer to Krylov.jl's growing workspace (src/Ariadne.jl:317-318).


def tree_stack_like(x, m: int):
    """Zero-initialised stacked basis: every leaf gains a leading axis m."""
    return jax.tree.map(lambda l: jnp.zeros((m,) + l.shape, l.dtype), x)


def tree_get_row(V, k):
    """Extract basis vector k as a plain state pytree (dynamic index ok)."""
    return jax.tree.map(lambda l: jax.lax.dynamic_index_in_dim(l, k, 0, keepdims=False), V)


def tree_set_row(V, k, x):
    """Return V with row k replaced by state x (functional update)."""
    return jax.tree.map(
        lambda vl, xl: jax.lax.dynamic_update_index_in_dim(vl, xl, k, 0), V, x
    )


def tree_basis_combine(V, coeffs):
    """sum_j coeffs[j] * V[j]  as one contraction per leaf.

    coeffs has shape (m,).  Entries beyond the active basis size must be zero
    (masked by the caller) — fixed shapes under jit, as required on TPU.
    """
    def comb(l):
        c = coeffs.astype(l.dtype)
        return jnp.tensordot(c, l, axes=(0, 0))

    return jax.tree.map(comb, V)


def tree_project_rows(V, w):
    """All inner products <V[j], w> at once → shape (m,).

    One reduction per leaf (a matvec for 2-D leaves) instead of m separate
    dots: this is the classical-Gram-Schmidt projection used by the CGS2
    orthogonaliser, replacing Krylov.jl's sequential MGS kdot loop.
    """
    def proj(vl, wl):
        vl2 = vl.reshape(vl.shape[0], -1)
        return vl2.conj() @ wl.reshape(-1)

    parts = jax.tree.leaves(jax.tree.map(proj, V, w))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out
