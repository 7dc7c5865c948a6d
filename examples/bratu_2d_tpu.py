"""Flagship: 2-D Bratu JFNK to ‖F‖ ≤ 1e-8·‖F₀‖ by mixed-precision iterative
refinement (f64 state/residual, f32 Krylov + fused Pallas stencil JVP).

Run with NK_TPU=1 on a chip; on CPU the Pallas kernel runs interpreted.
"""

import time

import _common  # noqa: F401
import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.kernels.stencil2d import aligned_interior
from newtonkrylov_tpu.problems import bratu2d


def main():
    n = 512 if jax.default_backend() == "tpu" else 128
    u0a, p, space = bratu2d.aligned_setup(n, lam=5.0, dtype=jnp.float64)

    t0 = time.perf_counter()
    u, info = newton_krylov_jit(
        lambda u, pp: bratu2d.residual_scaled_aligned(u, pp), u0a, p,
        algo="cg", tol_rel=1e-8, space=space, krylov_dtype=jnp.float32,
    )
    s = float(jnp.sum(u))  # sync
    wall = time.perf_counter() - t0

    hist = np.asarray(info.history)
    k = int(info.stats.outer_iterations)
    print(f"n={n}^2 lam=5: solved={bool(info.solved)} outer={k} "
          f"inner={int(info.stats.inner_iterations)} |F|={float(info.stats.n_res):.3e} "
          f"wall={wall:.2f}s (incl. compile)")
    print("residual history:", hist[: k + 1])

    ui = np.asarray(aligned_interior(u, n))
    fig, axs = plt.subplots(1, 2, figsize=(11, 4))
    im = axs[0].imshow(ui, origin="lower", extent=(0, 1, 0, 1))
    fig.colorbar(im, ax=axs[0])
    axs[0].set_title(f"2-D Bratu solution, {n}²")
    axs[1].semilogy(hist[: k + 1], "o-")
    axs[1].set_xlabel("Newton iteration")
    axs[1].set_ylabel("‖F(u)‖")
    axs[1].set_title("convergence (quadratic tail)")
    _common.save_plot(fig, "bratu2d.png")


if __name__ == "__main__":
    main()
