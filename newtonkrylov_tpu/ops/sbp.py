"""Summation-by-parts / DG derivative operators (AD-through-operators layer).

The reference's DG example (``examples/heat_1D_DG.jl``) discretizes the heat
equation as the composition ``du = D1m @ (D1p @ u)`` of upwind derivative
operators from SummationByPartsOperators.jl — demonstrating that the AD-based
Jacobian operator differentiates straight through third-party linear
operators.  This module provides the TPU-native equivalents as dense/banded
matrices (small enough that XLA maps the matvecs onto the MXU):

* :func:`periodic_upwind_operators` — biased finite-difference pairs
  ``(D_minus, D_plus)`` of accuracy order 1–3 on a uniform periodic grid
  (cf. ``upwind_operators(periodic_derivative_operator; accuracy_order=3)``,
  examples/heat_1D_DG.jl:134-141).
* :func:`legendre_derivative_operator` — nodal Legendre-Gauss-Lobatto
  collocation derivative on [-1, 1]
  (cf. ``legendre_derivative_operator``, examples/heat_1D_DG.jl:20).
* :func:`couple_discontinuously` — glue element-local operators into a global
  periodic upwind DG-SBP operator with interface flux from the minus/plus
  side (cf. examples/heat_1D_DG.jl:24-25).

All constructors are NumPy/host-side (operator setup is one-time); the
returned matrices are jnp arrays used inside jitted residuals.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "periodic_upwind_operators",
    "legendre_derivative_operator",
    "UniformPeriodicMesh1D",
    "couple_discontinuously",
]


_UPWIND_COEFFS = {
    # accuracy_order: (offsets, coeffs) for the MINUS (backward-biased) stencil
    1: ([-1, 0], [-1.0, 1.0]),
    2: ([-2, -1, 0], [0.5, -2.0, 1.5]),
    3: ([-2, -1, 0, 1], [1.0 / 6.0, -1.0, 0.5, 1.0 / 3.0]),
}


def periodic_upwind_operators(n: int, dx: float, accuracy_order: int = 3):
    """Backward/forward-biased first-derivative pair on a periodic grid.

    Returns dense ``(n, n)`` matrices ``(D_minus, D_plus)`` with
    ``D_plus = -D_minusᵀ`` (the SBP adjoint pair), so ``D_minus @ D_plus`` is
    a symmetric negative-semidefinite Laplacian — the property the reference's
    heat solve relies on.
    """
    offsets, coeffs = _UPWIND_COEFFS[accuracy_order]
    Dm = np.zeros((n, n))
    for off, c in zip(offsets, coeffs):
        for i in range(n):
            Dm[i, (i + off) % n] += c / dx
    Dp = -Dm.T
    return jnp.asarray(Dm), jnp.asarray(Dp)


def _lgl_nodes_weights(n: int):
    """Legendre-Gauss-Lobatto nodes/weights on [-1, 1] (n nodes, n ≥ 2)."""
    if n == 2:
        return np.array([-1.0, 1.0]), np.array([1.0, 1.0])
    # Interior nodes: roots of P'_{n-1} via eigenvalues of the Jacobi matrix
    # of the (1,1) Jacobi polynomials; simpler: Newton iteration on P'_{n-1}.
    from numpy.polynomial import legendre as L

    # derivative of Legendre P_{n-1}
    c = np.zeros(n)
    c[-1] = 1.0
    dP = L.legder(c)
    interior = L.legroots(dP)
    x = np.concatenate([[-1.0], np.sort(interior), [1.0]])
    # weights w_i = 2 / (n(n-1) P_{n-1}(x_i)^2)
    Pn1 = L.legval(x, c)
    w = 2.0 / (n * (n - 1) * Pn1**2)
    return x, w


def legendre_derivative_operator(N: int):
    """Nodal LGL collocation derivative matrix and quadrature weights.

    Returns ``(x, w, D)`` with ``x`` the N LGL nodes on [-1,1], ``w`` the
    quadrature weights (diagonal mass matrix), and ``D`` the (N, N)
    differentiation matrix (exact on polynomials of degree < N).  Satisfies
    the SBP property ``M D + (M D)ᵀ = B`` with ``M = diag(w)``,
    ``B = diag(-1, 0, …, 0, 1)``.
    """
    x, w = _lgl_nodes_weights(N)
    # Barycentric differentiation matrix
    X = x[:, None] - x[None, :]
    np.fill_diagonal(X, 1.0)
    lam = 1.0 / np.prod(X, axis=1)  # barycentric weights (up to scale)
    D = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            if i != j:
                D[i, j] = (lam[j] / lam[i]) / (x[i] - x[j])
        D[i, i] = -np.sum(D[i, [j for j in range(N) if j != i]])
    return x, w, D


class UniformPeriodicMesh1D:
    """Uniform periodic partition of [xmin, xmax] into Nx elements
    (cf. examples/heat_1D_DG.jl:21)."""

    def __init__(self, xmin: float, xmax: float, Nx: int):
        self.xmin = xmin
        self.xmax = xmax
        self.Nx = Nx
        self.h = (xmax - xmin) / Nx


def couple_discontinuously(local_op, mesh: UniformPeriodicMesh1D, mode: str = "central"):
    """Assemble a global periodic DG-SBP derivative from an element-local LGL
    operator with discontinuous (upwind/central) interface coupling
    (cf. examples/heat_1D_DG.jl:24-25).

    ``local_op`` is the ``(x, w, D)`` triple of
    :func:`legendre_derivative_operator`; ``mode`` selects the interface flux:
    ``"minus"`` takes the value from the left element, ``"plus"`` from the
    right, ``"central"`` their average.  Returns ``(x_global, D_global)`` with
    ``x_global`` of shape (Nx·N,) and a dense global matrix.

    The plus operator is constructed as the M-weighted adjoint of the minus
    one, ``D₊ = −M⁻¹ D₋ᵀ M`` — the defining property of an upwind SBP pair,
    which guarantees the composition ``D₋ @ D₊`` is negative semidefinite in
    the M inner product (the stability the reference's heat-via-composition
    solve relies on, examples/heat_1D_DG.jl:32-36).
    """
    x, w, D = local_op
    N = len(x)
    K = mesh.Nx
    J = mesh.h / 2.0  # affine map Jacobian

    n = K * N
    G = np.zeros((n, n))
    for k in range(K):
        s = k * N
        G[s : s + N, s : s + N] = D / J

    # SAT correction for the MINUS (left-flux) operator, DG strong form:
    #   D u − M⁻¹ [e_N (u_N − u*_R) − e₁ (u₁ − u*_L)]
    # with the minus flux u*_R = u_N (own) and u*_L = u_{k−1,N}:
    #   D u + M⁻¹ e₁ (u₁ − u_{k−1,N}) / J.
    tau_l = 1.0 / (w[0] * J)
    for k in range(K):
        s = k * N
        left_nb = ((k - 1) % K) * N + (N - 1)   # right endpoint of left element
        i_l = s                                  # own left endpoint
        G[i_l, i_l] += tau_l
        G[i_l, left_nb] -= tau_l

    mg = np.tile(w * J, K)  # global diagonal mass matrix

    # D₊[i,j] = -(1/m_i) · D₋[j,i] · m_j
    Gplus = -(G.T * mg[None, :]) / mg[:, None]
    if mode == "minus":
        Gout = G
    elif mode == "plus":
        Gout = Gplus
    elif mode == "central":
        Gout = 0.5 * (G + Gplus)
    else:
        raise ValueError(f"unknown coupling mode {mode!r}")

    # Global grid coordinates
    xg = np.concatenate([mesh.xmin + k * mesh.h + (x + 1.0) * J for k in range(K)])
    return jnp.asarray(xg), jnp.asarray(Gout)
