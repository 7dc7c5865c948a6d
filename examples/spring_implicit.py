"""Harmonic oscillator: stepper stability comparison over Δt
(mirrors examples/spring.jl:44-103, incl. the step-Jacobian probes)."""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu.problems import spring
from newtonkrylov_tpu.timestep import integrate, step_jacobian


def main():
    p = spring.default_config()

    for name in ("euler", "midpoint", "trapezoid"):
        J = np.asarray(step_jacobian(name, spring.rhs, jnp.array([0.1, 0.0]), p, 0.1))
        print(f"{name:10s} step-Jacobian:\n{J}")

    dts = [0.01, 0.05, 0.1, 1.0]
    fig, axs = plt.subplots(len(dts), 3, figsize=(13, 3 * len(dts)), sharex=True)
    for row, dt in zip(axs, dts):
        for ax, name in zip(row, ("euler", "midpoint", "trapezoid")):
            r = integrate(name, spring.rhs, spring.initial_condition(), p, dt, 40.0,
                          save_history=True)
            hist = np.asarray(r.history)
            ax.plot(np.asarray(r.ts), hist[:, 0], lw=0.8)
            ax.set_title(f"{name}, Δt={dt}")
    _common.save_plot(fig, "spring.png")
    # damping check: euler damps, trapezoid conserves
    for name, expect in (("euler", "damps"), ("trapezoid", "conserves")):
        r = integrate(name, spring.rhs, spring.initial_condition(), p, 0.1, 40.0)
        print(f"{name}: final amplitude {float(jnp.abs(r.u[0])):.4f} ({expect})")


if __name__ == "__main__":
    main()
