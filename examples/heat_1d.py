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


def jacobian_study_matrix_free():
    """The same cond study, matrix-free (newtonkrylov_tpu.spectral) — at a
    size where collect(J)+dense cond (the reference's only tool,
    examples/implicit.jl:41-50) is out of reach."""
    from newtonkrylov_tpu.operator import JacobianOperator
    from newtonkrylov_tpu.spectral import cond2_estimate
    from newtonkrylov_tpu.timestep import STEPPERS, StepParams

    # agreement with the dense oracle at small N
    N = 10
    p = heat1d.Params(a=0.5, dx=1.0 / (N + 1), bc="dirichlet")
    for name in ("euler", "midpoint", "trapezoid"):
        J_dense = np.asarray(step_jacobian(name, heat1d.rhs, jnp.zeros(N + 2), p, 0.1))
        G = STEPPERS[name](heat1d.rhs)
        sp = StepParams(un=jnp.zeros(N + 2), dt=0.1, p=p, t=0.0)
        J = JacobianOperator(G, jnp.zeros(N + 2), sp)
        k_mf = float(cond2_estimate(J, k=N + 2))
        print(f"{name:10s} cond(dense)={np.linalg.cond(J_dense):.6g} "
              f"cond(matrix-free, k=n)={k_mf:.6g}")

    # and at N=100_000 — 10 GB dense, impossible for collect(J); one
    # Lanczos run on the normal operator does it matrix-free
    N = 100_000
    p = heat1d.Params(a=0.5, dx=1.0 / (N + 1), bc="dirichlet")
    G = STEPPERS["euler"](heat1d.rhs)
    sp = StepParams(un=jnp.zeros(N + 2), dt=0.1, p=p, t=0.0)
    J = JacobianOperator(G, jnp.zeros(N + 2), sp)
    # Lanczos extremes of this Jacobian are quadratically clustered, so at
    # k ≪ n the estimate is a LOWER bound (like LAPACK's 1-norm estimators)
    print(f"euler N=1e5 cond2 >= {float(cond2_estimate(J, k=128)):.4g} "
          f"(k=128 Lanczos lower bound)")


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
    jacobian_study_matrix_free()
    march()
