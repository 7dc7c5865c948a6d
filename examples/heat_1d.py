"""1-D heat equation with implicit steppers + step-Jacobian analysis
(mirrors examples/heat_1D.jl: rank/condition studies and the L=1, M=100,
a=0.2, Δt=0.1 march)."""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu.problems import heat1d
from newtonkrylov_tpu.timestep import integrate, step_jacobian


def jacobian_study():
    """cf. examples/heat_1D.jl:55-93: rank/cond per stepper."""
    N = 10
    p = heat1d.Params(a=0.5, dx=1.0 / (N + 1), bc="dirichlet")
    for name in ("euler", "midpoint", "trapezoid"):
        J = np.asarray(step_jacobian(name, heat1d.rhs, jnp.zeros(N + 2), p, 0.1))
        print(f"{name:10s} rank={np.linalg.matrix_rank(J)} cond={np.linalg.cond(J):.4g}")
    Jp = np.asarray(
        step_jacobian("euler", heat1d.rhs, jnp.zeros(N + 2),
                      heat1d.Params(a=0.5, dx=1.0 / (N + 1), bc="periodic"), 0.1)
    )
    print(f"euler+periodic rank={np.linalg.matrix_rank(Jp)}")


def march():
    m, a, dt, t_final = 100, 0.2, 0.1, 3.0
    p = heat1d.default_config(m, a)
    x = heat1d.grid(m)
    u0 = heat1d.clamp_bc(heat1d.initial_condition(x), p)

    fig, axs = plt.subplots(1, 3, figsize=(14, 4), sharey=True)
    for ax, name in zip(axs, ("euler", "midpoint", "trapezoid")):
        r = integrate(name, heat1d.rhs, u0, p, dt, t_final, save_history=True)
        assert r.n_failed == 0
        hist = np.asarray(r.history)
        for row in hist:
            ax.plot(np.asarray(x), row, lw=0.8)
        ax.set_title(name)
    _common.save_plot(fig, "heat1d.png")


if __name__ == "__main__":
    jacobian_study()
    march()
