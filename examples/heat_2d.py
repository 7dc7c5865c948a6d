"""2-D diffusion on the halo layout with all three implicit steppers
(mirrors examples/heat_2D.jl: a=0.01, 40×40, explicit-stability Δt, frames of
the decaying sin-bump; the video becomes a frame strip)."""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu.problems import heat2d
from newtonkrylov_tpu.timestep import integrate


def main():
    n = 40
    p = heat2d.default_config(n)
    dt = heat2d.stable_dt(p)
    u0 = heat2d.initial_condition(n)
    print(f"dt={dt:.4g} (explicit-stability step, examples/heat_2D.jl:72)")

    for name in ("euler", "midpoint", "trapezoid"):
        frames = []
        r = integrate(
            name, heat2d.rhs, u0, p, dt, 40 * dt,
            callback=lambda u: frames.append(np.asarray(u)),
            newton_kwargs={"algo": "cg", "krylov_kwargs": {"reorthogonalize": True}},
        )
        decay = float(jnp.max(r.u) / jnp.max(u0))
        print(f"{name:10s} failed={r.n_failed} decay={decay:.4f} "
              f"(analytic {np.exp(-2*p.a*np.pi**2*40*dt):.4f})")

        fig, axs = plt.subplots(1, 5, figsize=(16, 3.2))
        for ax, idx in zip(axs, np.linspace(0, len(frames) - 1, 5).astype(int)):
            ax.imshow(frames[idx], origin="lower", extent=(0, 1, 0, 1), vmin=0, vmax=1)
            ax.set_title(f"step {idx+1}")
        _common.save_plot(fig, f"heat2d_{name}.png")

    # periodic BCs: constant field is an equilibrium
    pp = heat2d.default_config(16, bc="periodic")
    du = heat2d.rhs(jnp.ones((16, 16)), pp)
    print("periodic constant-field residual:", float(jnp.max(jnp.abs(du))))


if __name__ == "__main__":
    main()
