"""Implicit steppers + marching drivers (examples/implicit.jl parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu.problems import heat1d, spring
from newtonkrylov_tpu.timestep import (
    STEPPERS,
    StepParams,
    implicit_euler,
    implicit_midpoint,
    implicit_trapezoid,
    integrate,
    integrate_scan,
    step_jacobian,
)


def test_stepper_residual_formulas():
    """G formulas match examples/implicit.jl:8-37 on a hand-checked linear RHS."""
    f = lambda u, p, t: -2.0 * u  # du/dt = -2u
    un = jnp.array([1.0])
    dt = 0.1
    sp = StepParams(un=un, dt=dt, p=None, t=0.1)

    # Euler: res = un + dt*(-2u) - u
    G = implicit_euler(f)
    u = jnp.array([0.8])
    np.testing.assert_allclose(G(u, sp), 1.0 + 0.1 * (-2 * 0.8) - 0.8, rtol=1e-14)

    # Midpoint: res = un + dt*f(0.5(un+u)) - u
    G = implicit_midpoint(f)
    np.testing.assert_allclose(G(u, sp), 1.0 + 0.1 * (-2 * 0.9) - 0.8, rtol=1e-14)

    # Trapezoid: res = un + dt/2*(f(un)+f(u)) - u
    G = implicit_trapezoid(f)
    np.testing.assert_allclose(G(u, sp), 1.0 + 0.05 * (-2 * 1.0 - 2 * 0.8) - 0.8, rtol=1e-14)


def test_euler_scalar_decay_exact():
    """Backward Euler on du/dt = -u has exact update u/(1+dt) per step."""
    f = lambda u, p, t: -u
    r = integrate("euler", f, jnp.array([1.0]), None, 0.5, 2.0)
    expect = 1.0 / (1.5 ** 4)
    np.testing.assert_allclose(r.u[0], expect, rtol=1e-6)
    assert r.n_failed == 0


def test_step_jacobian_probe():
    """cf. jacobian() (examples/implicit.jl:41-50) on the spring system
    (examples/spring.jl:92-103): G_Euler Jacobian = dt*A - I."""
    p = spring.default_config()  # gamma^2 = 2
    J = step_jacobian("euler", spring.rhs, jnp.array([0.1, 0.0]), p, 0.01)
    A = np.array([[0.0, 1.0], [-2.0, 0.0]])
    np.testing.assert_allclose(J, 0.01 * A - np.eye(2), atol=1e-12)


@pytest.mark.parametrize("name", ["euler", "midpoint", "trapezoid"])
def test_spring_steppers_march(name):
    """Spring marches stably at dt=0.01 for all three steppers
    (examples/spring.jl:72-88)."""
    p = spring.default_config()
    u0 = spring.initial_condition()
    r = integrate(name, spring.rhs, u0, p, 0.01, 2.0)
    assert r.n_failed == 0
    # amplitude bounded by initial amplitude (implicit schemes are stable)
    assert abs(float(r.u[0])) <= 0.11
    # trapezoid/midpoint are 2nd order: close to the exact solution
    if name in ("midpoint", "trapezoid"):
        exact = float(spring.exact_solution(2.0, p))
        np.testing.assert_allclose(float(r.u[0]), exact, atol=2e-4)


def test_heat1d_march_decays():
    """Heat solve decays toward 0 with Dirichlet BCs (examples/heat_1D.jl:99-121)."""
    p = heat1d.default_config(m=100, a=0.2)
    x = heat1d.grid(100)
    u0 = heat1d.clamp_bc(heat1d.initial_condition(x), p)
    r = integrate("euler", heat1d.rhs, u0, p, 0.1, 1.0, save_history=True)
    assert r.n_failed == 0
    n0 = float(jnp.linalg.norm(u0))
    nT = float(jnp.linalg.norm(r.u))
    assert nT < 0.5 * n0
    # boundary rows stay clamped
    assert float(r.u[0]) == 0.0 and float(r.u[-1]) == 0.0
    # history stacked: initial + 10 steps
    assert r.history.shape[0] == 11


def test_integrate_scan_matches_host_loop():
    """The one-XLA-program march reproduces the host loop."""
    p = spring.default_config()
    u0 = spring.initial_condition()
    r1 = integrate("midpoint", spring.rhs, u0, p, 0.05, 1.0, save_history=True)
    r2 = integrate_scan("midpoint", spring.rhs, u0, p, 0.05, 20)
    np.testing.assert_allclose(r1.u, r2.u, rtol=1e-10)
    assert int(r2.n_failed) == 0
    # per-step stats exposed
    assert r2.outer_iterations.shape == (20,)
    np.testing.assert_array_equal(np.asarray(r1.outer_iterations), np.asarray(r2.outer_iterations))


def test_integrate_scan_jittable():
    p = spring.default_config()
    u0 = spring.initial_condition()

    @jax.jit
    def run(u0):
        return integrate_scan("euler", spring.rhs, u0, p, 0.05, 10).u

    r = run(u0)
    assert np.isfinite(np.asarray(r)).all()


def test_callback_and_warn_continue():
    frames = []
    p = spring.default_config()
    r = integrate(
        "euler", spring.rhs, spring.initial_condition(), p, 0.1, 0.5,
        callback=lambda u: frames.append(np.asarray(u)),
    )
    assert len(frames) == 5  # one per step (examples/implicit.jl:74)
