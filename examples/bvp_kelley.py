"""Kelley2022 two-point BVP, n=801 (mirrors examples/bvp.jl).

The robust recipe is GMRES + pivoted banded LU(2,2) — the BVP Jacobian is
pentadiagonal with zero diagonals on the BC rows, and its spectrum straddles
the origin, which defeats GMRES-polynomial preconditioning (the reference's
FGMRES + nested-GMRES(30) recipe is shown for comparison; it stalls).
"""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import newton_krylov, precond
from newtonkrylov_tpu.problems import bvp


def main():
    p = bvp.default_config()
    U0 = bvp.initial_guess(p)

    U, info = newton_krylov(bvp.residual, U0, p, algo="gmres", N=precond.banded_lu(2, 2))
    print(f"banded-LU recipe: solved={bool(info.solved)} outer={info.stats.outer_iterations} "
          f"inner={info.stats.inner_iterations} |F|={info.stats.n_res:.2e}")

    _, info2 = newton_krylov(
        bvp.residual, U0, p, algo="fgmres",
        N=precond.nested_krylov(itmax=30), krylov_kwargs={"restart": 40},
        max_niter=5,
    )
    print(f"reference fgmres+nested recipe (5 outers): |F|={info2.stats.n_res:.2e} (stalls)")

    t = np.asarray(p.tv)
    v = np.asarray(U[0::2])
    vp = np.asarray(U[1::2])
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(t, v, label="v(t)")
    ax.plot(t, vp, label="v'(t)")
    ax.legend()
    ax.set_title("Kelley2022 BVP solution, n=801")
    _common.save_plot(fig, "bvp.png")


if __name__ == "__main__":
    main()
