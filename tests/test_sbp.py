"""SBP / DG operator properties and the heat-via-operator-composition march
(examples/heat_1D_DG.jl parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu.ops.sbp import (
    UniformPeriodicMesh1D,
    couple_discontinuously,
    legendre_derivative_operator,
    periodic_upwind_operators,
)
from newtonkrylov_tpu.problems import heat1d_dg
from newtonkrylov_tpu.timestep import integrate


class TestUpwindFD:
    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_accuracy_on_smooth_function(self, order):
        n, L = 128, 1.0
        dx = L / n
        Dm, Dp = periodic_upwind_operators(n, dx, order)
        x = jnp.arange(n) * dx
        u = jnp.sin(2 * jnp.pi * x)
        du_exact = 2 * jnp.pi * jnp.cos(2 * jnp.pi * x)
        for D in (Dm, Dp):
            err = float(jnp.max(jnp.abs(D @ u - du_exact)))
            # truncation constant ~ (2π)^{order+1}/(order factor); generous cap
            assert err < 500.0 * dx**order, (order, err)

    def test_adjoint_pair(self):
        Dm, Dp = periodic_upwind_operators(32, 0.1, 3)
        np.testing.assert_allclose(Dp, -Dm.T, atol=1e-14)

    def test_composition_negative_semidefinite(self):
        """D1m @ D1p must be symmetric NSD — the stability property the heat
        solve needs (examples/heat_1D_DG.jl:32-36)."""
        Dm, Dp = periodic_upwind_operators(48, 0.05, 2)
        Lap = np.asarray(Dm @ Dp)
        np.testing.assert_allclose(Lap, Lap.T, atol=1e-10)
        ev = np.linalg.eigvalsh(Lap)
        assert ev.max() < 1e-8


class TestLegendreDG:
    def test_lgl_derivative_exact_on_polynomials(self):
        x, w, D = legendre_derivative_operator(4)  # polydeg 3
        for k in range(4):
            p = x**k
            dp = k * x ** max(k - 1, 0) if k > 0 else np.zeros_like(x)
            np.testing.assert_allclose(D @ p, dp, atol=1e-12)

    def test_sbp_property(self):
        """M D + (M D)ᵀ = B = diag(-1, 0, ..., 0, 1)."""
        x, w, D = legendre_derivative_operator(5)
        M = np.diag(w)
        Q = M @ D
        B = np.zeros_like(Q)
        B[0, 0] = -1.0
        B[-1, -1] = 1.0
        np.testing.assert_allclose(Q + Q.T, B, atol=1e-12)

    def test_coupled_operator_consistency(self):
        """Global minus/plus DG operators differentiate smooth periodic
        functions (examples/heat_1D_DG.jl:17-27 configuration)."""
        local_op = legendre_derivative_operator(4)
        mesh = UniformPeriodicMesh1D(0.0, 1.0, 16)
        x, Dm = couple_discontinuously(local_op, mesh, "minus")
        _, Dp = couple_discontinuously(local_op, mesh, "plus")
        u = jnp.sin(2 * jnp.pi * x)
        du = 2 * jnp.pi * jnp.cos(2 * jnp.pi * x)
        for D in (Dm, Dp):
            err = float(jnp.max(jnp.abs(D @ u - du)))
            assert err < 0.2, err  # polydeg-3 on 16 elements

    def test_constants_annihilated(self):
        local_op = legendre_derivative_operator(4)
        mesh = UniformPeriodicMesh1D(0.0, 1.0, 8)
        for mode in ("minus", "plus", "central"):
            _, D = couple_discontinuously(local_op, mesh, mode)
            np.testing.assert_allclose(D @ jnp.ones(D.shape[0]), 0.0, atol=1e-11)

    def test_dg_laplacian_stable(self):
        """D1m @ D1p is NSD in the M-weighted inner product (heat stability).

        D₊ = −M⁻¹D₋ᵀM by construction, so xᵀM D₋D₊ x = −‖D₋ᵀMx‖²_{M⁻¹} ≤ 0.
        """
        polydeg, elements = 3, 12
        p = heat1d_dg.dg_config(polydeg=polydeg, elements=elements)
        _, w, _ = legendre_derivative_operator(polydeg + 1)
        mesh = UniformPeriodicMesh1D(0.0, 1.0, elements)
        mg = np.tile(w * mesh.h / 2.0, elements)
        Lap = np.asarray(p.D1m @ p.D1p)
        MLap = mg[:, None] * Lap
        sym = 0.5 * (MLap + MLap.T)
        ev = np.linalg.eigvalsh(sym)
        assert ev.max() < 1e-8, ev.max()


class TestHeatDGMarch:
    def test_dg_heat_decays(self):
        """Implicit Euler heat march through the DG composition
        (examples/heat_1D_DG.jl solve_heat_1D)."""
        p = heat1d_dg.dg_config(polydeg=3, elements=16)
        u0 = heat1d_dg.initial_condition(p)
        r = integrate("euler", heat1d_dg.rhs, u0, p, 0.01, 0.2)
        assert r.n_failed == 0
        # heat equation with sin(pi x) on periodic [0,1]: modes decay
        assert float(jnp.linalg.norm(r.u)) < float(jnp.linalg.norm(u0))
        assert np.isfinite(np.asarray(r.u)).all()

    def test_upwind_heat_decays(self):
        """Upwind-operator variant (examples/heat_1D_DG.jl:134-141)."""
        p = heat1d_dg.upwind_config(nnodes=120, accuracy_order=3)
        u0 = heat1d_dg.initial_condition(p)
        r = integrate("euler", heat1d_dg.rhs, u0, p, 0.01, 0.2)
        assert r.n_failed == 0
        assert float(jnp.linalg.norm(r.u)) < float(jnp.linalg.norm(u0))
