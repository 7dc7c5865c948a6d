"""Heat equation via DG / upwind operator composition du = D1m @ (D1p @ u)
(mirrors examples/heat_1D_DG.jl: polydeg-3 × 40-element Legendre DG and the
order-3 periodic upwind pair; Jacobians of the implicit steps shown)."""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu.problems import heat1d_dg
from newtonkrylov_tpu.timestep import integrate, step_jacobian


def run(tag, p, dt=0.0005, t_final=0.05):
    u0 = heat1d_dg.initial_condition(p)
    r = integrate("euler", heat1d_dg.rhs, u0, p, dt, t_final, save_history=True)
    print(f"{tag:18s} failed={r.n_failed} |u0|={float(jnp.linalg.norm(u0)):.4f} "
          f"-> |u|={float(jnp.linalg.norm(r.u)):.4f}")
    return p.x, np.asarray(r.history)


def main():
    p_dg = heat1d_dg.dg_config(polydeg=3, elements=40)
    J = np.asarray(step_jacobian("euler", heat1d_dg.rhs, jnp.zeros_like(p_dg.x), p_dg, 0.1))
    print(f"DG euler step-Jacobian: shape={J.shape} cond={np.linalg.cond(J):.4g}")

    fig, axs = plt.subplots(1, 2, figsize=(12, 4))
    for ax, (tag, p) in zip(
        axs,
        [("legendre DG", p_dg), ("upwind order-3", heat1d_dg.upwind_config(nnodes=120))],
    ):
        x, hist = run(tag, p)
        ax.plot(np.asarray(x), hist[0], label="t=0")
        ax.plot(np.asarray(x), hist[-1], label="t=end")
        ax.set_title(tag)
        ax.legend()
    _common.save_plot(fig, "heat1d_dg.png")


if __name__ == "__main__":
    main()
