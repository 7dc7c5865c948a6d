"""Flagship: 2-D Bratu JFNK to ‖F‖ ≤ 1e-8·‖F₀‖ by mixed-precision iterative
refinement — the bench.py production recipe, in example form.

Two lanes, both f64-accurate without an emulated-f64 op in the loop:

* plain refined CG on the DMA-aligned layout (f32 Krylov + fused Pallas
  stencil JVP) — the kernel showcase;
* the production recipe: df32 (paired-f32) acceptance residual, f32 CG
  preconditioned by the exact DST Poisson solve on the MXU (bf16x3 sine
  matmuls), factory frozen at u₀ (``precond_refresh="once"``) — measured
  3.6 ms / 25 ms marginal per solve at 1024²/2048² on one v5e chip.

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
from newtonkrylov_tpu.fftprec import fft_poisson
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
    print(f"n={n}^2 lam=5 [refined CG, Pallas]: solved={bool(info.solved)} "
          f"outer={k} inner={int(info.stats.inner_iterations)} "
          f"|F|={float(info.stats.n_res):.3e} wall={wall:.2f}s (incl. compile)")
    print("residual history:", hist[: k + 1])

    # Production recipe (bench.py flagship): df32 acceptance residual +
    # DST-preconditioned f32 CG, preconditioner frozen at u0.
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    pd = bratu2d.default_config(n, lam=5.0)
    t0 = time.perf_counter()
    u2, info2 = newton_krylov_jit(
        bratu2d.residual_scaled, u0, pd,
        algo="cg", tol_rel=1e-8, krylov_dtype=jnp.float32,
        residual_df=bratu2d.residual_scaled_df,
        M=fft_poisson(precision="high"), precond_refresh="once",
    )
    s2 = float(jnp.sum(u2))  # sync
    wall2 = time.perf_counter() - t0
    k2 = int(info2.stats.outer_iterations)
    print(f"n={n}^2 lam=5 [df32 + DST-PCG once]: solved={bool(info2.solved)} "
          f"outer={k2} inner={int(info2.stats.inner_iterations)} "
          f"|F|={float(info2.stats.n_res):.3e} wall={wall2:.2f}s (incl. compile)")
    assert bool(info.solved) and bool(info2.solved)

    ui = np.asarray(aligned_interior(u, n))
    fig, axs = plt.subplots(1, 2, figsize=(11, 4))
    im = axs[0].imshow(ui, origin="lower", extent=(0, 1, 0, 1))
    fig.colorbar(im, ax=axs[0])
    axs[0].set_title(f"2-D Bratu solution, {n}²")
    axs[1].semilogy(hist[: k + 1], "o-", label="refined CG")
    h2 = np.asarray(info2.history)
    axs[1].semilogy(h2[: k2 + 1], "s--", label="df32 + DST-PCG")
    axs[1].legend()
    axs[1].set_xlabel("Newton iteration")
    axs[1].set_ylabel("‖F(u)‖")
    axs[1].set_title("convergence (quadratic tail)")
    _common.save_plot(fig, "bratu2d.png")


if __name__ == "__main__":
    main()
