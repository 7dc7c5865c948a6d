"""Convection–diffusion recipe gallery — the NONSYMMETRIC regime.

The library's extension past the reference's all-symmetric 2-D problems
(every 2-D example in /root/reference is a Laplacian family;
examples/bratu.jl:110-157 shows the algo menu).  The manufactured forcing
makes u* = sin(pi x)sin(pi y) the exact discrete root, so every recipe is
checked by equality, and the gallery demonstrates the measured recipe map
of problems/convdiff2d.py:

* moderate convection (c=2): DST-Poisson-preconditioned GMRES works;
* convection-dominated (c=25): DST stalls (preconditioned spectrum
  straddles the origin) — shown as a negative recipe;
* ADI line relaxation (precond.adi) solves BOTH, entirely on device and
  jitted, including the production f32-Krylov + df32-acceptance path —
  where the reference's only robust recipe is host-side ILU;
* variable-coefficient multigrid (mg.multigrid2d_general, round 5): the
  ADI-smoothed V-cycle on the probed nonsymmetric fields — the
  resolution-robust recipe (counts ~flat in n; 13.6 ms vs 107 ms at 256²
  on the real-chip bench lanes).
"""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import newton_krylov, newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.mg import multigrid2d_general
from newtonkrylov_tpu.precond import adi, ilu0
from newtonkrylov_tpu.problems import convdiff2d

N = 96
FULL = {"restart": None, "itmax": 400}


def run(tag, c, M=None, N_pre=None, driver="jit", expect_fail=False,
        krylov_override=None, **kw):
    p = convdiff2d.default_config(N, c=c, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(N, jnp.float64)
    drv = newton_krylov_jit if driver == "jit" else newton_krylov
    u, info = drv(convdiff2d.residual_scaled, u0, p,
                  algo="gmres", forcing=None, M=M, N=N_pre,
                  krylov_kwargs=dict(krylov_override or FULL), **kw)
    us = convdiff2d.manufactured_solution(N, jnp.float64)
    err = float(jnp.max(jnp.abs(u - us)))
    note = "  (expected: does NOT converge)" if expect_fail else ""
    print(f"{tag:36s} solved={str(bool(info.solved)):5s} "
          f"outer={int(info.stats.outer_iterations):3d} "
          f"inner={int(info.stats.inner_iterations):5d} "
          f"max|u-u*|={err:.2e}{note}")
    if expect_fail and bool(info.solved):
        raise AssertionError(f"negative recipe {tag!r} unexpectedly converged")
    if not expect_fail:
        assert bool(info.solved), tag
    return u


def main():
    print(f"--- c = 2 (moderate convection), n = {N} ---")
    run("gmres + DST Poisson", 2.0, M=fft_poisson(), tol_rel=1e-10)
    run("gmres + ADI(4)", 2.0, M=adi(4), tol_rel=1e-10)

    print(f"--- c = 25 (convection-dominated) ---")
    # The DST-preconditioned spectrum straddles the origin past c ~ 6
    # (module docstring): restarted GMRES stalls outright, and even with
    # an unrestarted 400-dim Krylov space the solve limps at ~350 inners
    # per outer — ~26x ADI's total at the same tolerance.
    run("gmres(restart=40) + DST Poisson", 25.0, M=fft_poisson(),
        tol_rel=1e-10, max_niter=6, expect_fail=True,
        krylov_override={"restart": 40, "itmax": 400})
    run("gmres(full) + DST  [26x ADI cost]", 25.0, M=fft_poisson(),
        tol_rel=1e-10, max_niter=15)
    u = run("gmres + ADI(4)  [on-device]", 25.0, M=adi(4), tol_rel=1e-10,
            max_niter=15)
    run("gmres + MG-general  [multilevel]", 25.0, M=multigrid2d_general(),
        tol_rel=1e-10, max_niter=15)
    run("gmres + ADI(4) + df32 to 1e-8", 25.0, M=adi(4), tol_rel=1e-8,
        max_niter=15, krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df)
    run("gmres + MG-general + df32 1e-8", 25.0, M=multigrid2d_general(),
        tol_rel=1e-8, max_niter=15, krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df)
    run("gmres + ILU0  [host, reference]", 25.0,
        N_pre=ilu0(offsets=(-N, -1, 0, 1, N)), driver="host",
        tol_rel=1e-10, max_niter=15)

    X, Y = convdiff2d.grid(N, jnp.float64)
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(9, 3.6))
    im = ax0.imshow(np.asarray(u), origin="lower", extent=(0, 1, 0, 1))
    fig.colorbar(im, ax=ax0, shrink=0.8)
    ax0.set_title(f"convdiff c=25, n={N} (ADI, on device)")
    err = np.abs(np.asarray(u - convdiff2d.manufactured_solution(N, jnp.float64)))
    im = ax1.imshow(err, origin="lower", extent=(0, 1, 0, 1))
    fig.colorbar(im, ax=ax1, shrink=0.8)
    ax1.set_title("error vs manufactured root")
    _common.save_plot(fig, "convdiff2d.png")


if __name__ == "__main__":
    main()
