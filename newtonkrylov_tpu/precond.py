"""Preconditioner factories for the Newton inner solves.

The reference's preconditioning contract (src/Ariadne.jl:323-329): ``M``/``N``
are *factories* invoked with the current JacobianOperator at every outer
iteration, so the preconditioner always tracks the linearization point.  Its
two showcased recipes are rebuilt here TPU-natively, plus two structured ones
the TPU design makes cheap:

* :func:`nested_krylov` — truncated inner GMRES on the same matrix-free
  operator, used under FGMRES (``GmresPreconditioner``,
  examples/bratu.jl:141-157, examples/bvp.jl:30-38).  Fully jittable.
* :func:`jacobi` — diagonal scaling with the diagonal recovered by colored
  probing (bandwidth-many JVPs, not N).  Fully jittable.
* :func:`banded_direct` — exact banded solve (Thomas algorithm via
  ``lax.scan``) on the banded materialization: for 1-D stencil Jacobians this
  *is* ``ilu(collect(J))`` taken to completion (examples/bratu.jl:121-128),
  at O(bandwidth) probe cost.  Jittable.
* :func:`ilu0` — general host-side ILU(0) on the materialized sparse
  Jacobian (C++ kernel, NumPy fallback) — the literal analogue of the
  reference's ``N = (J) -> ilu(collect(J))`` recipe
  (examples/bratu.jl:121-138).  Host-side: use with the Python-stepped
  Newton driver (``jit_step`` is disabled automatically when host factories
  are present).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import solvers
from .operator import JacobianOperator, materialize_banded, materialize_csr

__all__ = ["nested_krylov", "jacobi", "banded_direct", "banded_lu", "ilu0", "thomas_solve"]


def nested_krylov(algo: str = "gmres", itmax: int = 5, rtol: Optional[float] = None, **kw) -> Callable:
    """Factory: J ↦ (x ↦ approximate J⁻¹x via a truncated Krylov solve).

    Mirrors ``GmresPreconditioner(J, itmax)`` (examples/bratu.jl:141-149):
    the preconditioner is nonstationary, so the outer solve must be FGMRES.
    """

    def factory(J):
        def apply(x):
            res = solvers.solve(
                algo, J, x,
                itmax=itmax, restart=min(itmax, 40),
                rtol=rtol, **kw,
            )
            return res.x

        return apply

    return factory


def jacobi(lower: int, upper: int) -> Callable:
    """Factory: diagonal (Jacobi) preconditioner for a banded Jacobian.

    The diagonal is recovered with colored probing
    (:func:`~newtonkrylov_tpu.operator.materialize_banded`) — lower+upper+1
    JVPs total.
    """

    def factory(J: JacobianOperator):
        offsets, diags = materialize_banded(J, lower, upper)
        d = diags[lower]  # offset 0
        safe = jnp.where(d != 0, d, 1.0)
        _, unravel = jax.flatten_util.ravel_pytree(J.u)

        def apply(x):
            flat, _ = jax.flatten_util.ravel_pytree(x)
            return unravel(flat / safe)

        return apply

    return factory


def thomas_solve(dl, d, du, b):
    """Tridiagonal solve via the Thomas algorithm (lax.scan, jittable).

    ``dl[i] = A[i, i-1]`` (dl[0] unused), ``d[i] = A[i, i]``,
    ``du[i] = A[i, i+1]`` (du[-1] unused).
    """
    n = d.shape[0]

    # Forward sweep: c'_i = du_i / (d_i - dl_i c'_{i-1}),
    #                g_i  = (b_i - dl_i g_{i-1}) / (d_i - dl_i c'_{i-1})
    def fwd(carry, inp):
        cp_prev, g_prev = carry
        dli, di, dui, bi = inp
        denom = di - dli * cp_prev
        cp = dui / denom
        g = (bi - dli * g_prev) / denom
        return (cp, g), (cp, g)

    dl0 = dl.at[0].set(0.0)
    (_, _), (cps, gs) = lax.scan(
        fwd, (jnp.zeros((), d.dtype), jnp.zeros((), d.dtype)), (dl0, d, du, b)
    )

    # Back substitution: x_i = g_i - c'_i x_{i+1}
    def bwd(x_next, inp):
        cp, g = inp
        x = g - cp * x_next
        return x, x

    _, xs_rev = lax.scan(bwd, jnp.zeros((), d.dtype), (cps, gs), reverse=True)
    return xs_rev


def banded_direct() -> Callable:
    """Factory: exact tridiagonal solve on the banded materialization.

    For tridiagonal stencil Jacobians (1-D Bratu/heat) this is the complete
    factorization the reference approximates with ILU
    (examples/bratu.jl:121-128) — at 3 JVPs + O(n) solve cost, fully on
    device.
    """

    def factory(J: JacobianOperator):
        offsets, diags = materialize_banded(J, 1, 1)
        sub, d, sup = diags  # offsets -1, 0, +1
        # thomas_solve indexes dl[i] = A[i,i-1]: our sub[i] = J[i, i-1]. ✓
        _, unravel = jax.flatten_util.ravel_pytree(J.u)

        def apply(b):
            flat, _ = jax.flatten_util.ravel_pytree(b)
            return unravel(thomas_solve(sub, d, sup, flat))

        return apply

    return factory


def banded_lu(lower: int, upper: int) -> Callable:
    """Factory: pivoted banded LU of the colored-probe materialization.

    Robust direct preconditioner for banded Jacobians whose boundary rows
    have zero diagonals (e.g. the BVP's BC rows ``res[0] = U[1]``,
    examples/bvp.jl:17-18 — ILU(0) hits a zero pivot there, partial pivoting
    does not).  Factorization+solve run host-side via LAPACK's pivoted banded
    solver; the application crosses into the traced Krylov loop via
    ``pure_callback``.  Probe cost: lower+upper+1 JVPs.
    """
    from scipy.linalg import solve_banded

    def factory(J: JacobianOperator):
        offsets, diags = materialize_banded(J, lower, upper)
        offs = np.asarray(offsets)
        dg = np.asarray(diags)
        n = dg.shape[1]
        # scipy ab format: ab[u + i - j, j] = A[i, j]; our diags[d][i] = A[i, i+off]
        ab = np.zeros((lower + upper + 1, n))
        for off, dvals in zip(offs, dg):
            r = upper - off
            cols = np.arange(max(0, off), n + min(0, off))
            ab[r, cols] = dvals[cols - off]
        _, unravel = jax.flatten_util.ravel_pytree(J.u)

        def host_solve(flat):
            return solve_banded((lower, upper), ab, np.asarray(flat, dtype=np.float64)).astype(flat.dtype)

        def apply(x):
            flat, _ = jax.flatten_util.ravel_pytree(x)
            out = jax.pure_callback(
                host_solve, jax.ShapeDtypeStruct(flat.shape, flat.dtype), flat
            )
            return unravel(out)

        return apply

    factory.host_side = True
    return factory


# ---------------------------------------------------------------------------
# Host-side ILU(0) (general sparsity) — C++ kernel with NumPy fallback.
# ---------------------------------------------------------------------------


def _dense_to_csr(A: np.ndarray, tol: float = 0.0):
    """Minimal CSR builder (no scipy dependency)."""
    n, m = A.shape
    indptr = np.zeros(n + 1, dtype=np.int64)
    cols = []
    vals = []
    for i in range(n):
        nz = np.nonzero(np.abs(A[i]) > tol)[0]
        cols.append(nz)
        vals.append(A[i, nz])
        indptr[i + 1] = indptr[i] + len(nz)
    return indptr, np.concatenate(cols).astype(np.int64), np.concatenate(vals)


def _ilu0_numpy(indptr, cols, vals):
    """In-place ILU(0) on CSR (IKJ variant), NumPy fallback for the C++ kernel."""
    n = len(indptr) - 1
    vals = vals.copy()
    # column position lookup per row
    colpos = [dict(zip(cols[indptr[i]: indptr[i + 1]], range(indptr[i], indptr[i + 1]))) for i in range(n)]
    diag = np.zeros(n, dtype=np.int64)
    for i in range(n):
        diag[i] = colpos[i][i]
    for i in range(1, n):
        for kk in range(indptr[i], indptr[i + 1]):
            k = cols[kk]
            if k >= i:
                break
            vals[kk] /= vals[diag[k]]
            lik = vals[kk]
            for jj in range(diag[k] + 1, indptr[k + 1]):
                j = cols[jj]
                pos = colpos[i].get(j)
                if pos is not None:
                    vals[pos] -= lik * vals[jj]
    return vals, diag


def _ilu0_solve_numpy(indptr, cols, vals, diag, b):
    n = len(indptr) - 1
    x = b.copy()
    # L y = b (unit lower)
    for i in range(n):
        s = x[i]
        for jj in range(indptr[i], diag[i]):
            s -= vals[jj] * x[cols[jj]]
        x[i] = s
    # U x = y
    for i in range(n - 1, -1, -1):
        s = x[i]
        for jj in range(diag[i] + 1, indptr[i + 1]):
            s -= vals[jj] * x[cols[jj]]
        x[i] = s / vals[diag[i]]
    return x


def _load_native():
    from .utils import native

    return native.load_ilu()


def ilu0(bandwidth: Optional[int] = None, offsets=None) -> Callable:
    """Factory: host-side ILU(0) of the materialized Jacobian.

    The literal TPU-era analogue of ``N = (J) -> ilu(collect(J))``
    (examples/bratu.jl:121-128).  Materialization, cheapest first:

    * ``offsets`` (flattened-index sparsity pattern, e.g. ``(-1, 0, 1)`` or
      ``(-m, -1, 0, 1, m)``): colored-probe CSR at **O(nnz) memory** and
      :func:`~newtonkrylov_tpu.operator.stencil_coloring`-many batched JVPs —
      use this at scale (the reference's recipe operates at N = 10⁴,
      examples/bratu.jl:40,121-128, where a dense intermediate is 800 MB);
    * ``bandwidth``: contiguous band, colored probing via
      ``materialize_banded``;
    * neither: dense ``jacfwd`` (small systems only).

    Factorization runs on host (C++ kernel via ctypes when built, NumPy
    otherwise); application is sparse triangular solves behind
    ``pure_callback``.  Host-side by construction — pair with the
    Python-stepped driver.  The factory's ``host_side`` attribute marks it so
    ``newton_krylov`` disables step jitting.
    """
    native = _load_native()

    def factory(J: JacobianOperator):
        if offsets is not None:
            indptr, cols, vals = materialize_csr(J, offsets)
        else:
            if bandwidth is not None:
                indptr, cols, vals = materialize_csr(
                    J, range(-bandwidth, bandwidth + 1)
                )
            else:
                A = np.asarray(J.materialize())
                indptr, cols, vals = _dense_to_csr(A)
        if native is not None:
            vals_f, diag = native.factorize(indptr, cols, vals)
            solve = lambda b: native.solve(indptr, cols, vals_f, diag, b)
        else:
            vals_f, diag = _ilu0_numpy(indptr, cols, vals)
            solve = lambda b: _ilu0_solve_numpy(indptr, cols, vals_f, diag, b)
        flat0, unravel = jax.flatten_util.ravel_pytree(J.u)

        def host_solve(flat):
            return solve(np.asarray(flat, dtype=np.float64)).astype(flat.dtype)

        def apply(x):
            flat, _ = jax.flatten_util.ravel_pytree(x)
            # pure_callback crosses from the traced Krylov while_loop to the
            # host triangular solves — the device↔host seam the reference's
            # ldiv-style ILU application implies (examples/bratu.jl:121-128).
            out = jax.pure_callback(
                host_solve, jax.ShapeDtypeStruct(flat.shape, flat.dtype), flat
            )
            return unravel(out)

        return apply

    # Factorization happens on host at factory-invocation time, so the Newton
    # *outer* step cannot be jitted (the inner Krylov loop still is; the
    # application crosses via pure_callback).
    factory.host_side = True
    return factory
