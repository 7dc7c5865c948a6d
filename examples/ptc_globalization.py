"""Pseudo-transient continuation: solving where plain Newton diverges.

The reference's Newton loop takes the full step s = 1 every iteration —
globalization is its explicit TODO (src/Ariadne.jl:341-344) and its failure
mode is a documented abort (src/Ariadne.jl:353-356).  This example shows the
library's Ψtc driver (``pseudo_transient``, Kelley 2003 ``ptcsol`` built as
one XLA program) on the two canonical situations:

1. **arctan(x) = 0 from x₀ = 3** — the textbook Newton-divergence witness:
   the Newton step overshoots with growing amplitude (|x| roughly squares
   once large), while Ψtc's damped steps walk into the basin and then
   accelerate to Newton speed (SER: δ grows by the residual-reduction
   ratio).

2. **2-D Bratu at λ = 6.8** (fold at λ* ≈ 6.808) **from rough
   large-amplitude starts** — Ψtc follows the stable heat flow
   ``du/dτ = Δu + λeᵘ`` (note the sign: pass −residual) and reaches the
   lower branch in fewer outer steps than Newton, reusing the same DST
   preconditioner factory (it probes the shifted operator δ⁻¹I + J
   automatically).

Run anywhere (CPU f64 by default; NK_TPU=1 for a chip).
"""

import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import newton_krylov_jit, pseudo_transient
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.problems import bratu2d


def arctan_comparison():
    F = lambda x, p: jnp.arctan(x)
    x0 = jnp.array([3.0])

    _, info_n = newton_krylov_jit(F, x0, max_niter=20)
    hist_n = np.asarray(info_n.history)
    print("newton  : solved=%s  history=%s" % (
        bool(info_n.solved), np.array2string(hist_n[np.isfinite(hist_n)][:6], precision=2)))

    u, info_p = pseudo_transient(F, x0)
    hist_p = np.asarray(info_p.history)
    print("ptc     : solved=%s  outer=%d  history=%s" % (
        bool(info_p.solved), int(info_p.stats.outer_iterations),
        np.array2string(hist_p[np.isfinite(hist_p)], precision=2)))
    assert bool(info_p.solved) and not bool(info_n.solved)


def bratu_rough_starts():
    n = 32
    p = bratu2d.default_config(n, lam=6.8)
    X, Y = bratu2d.grid(n)
    negF = lambda u, p: -bratu2d.residual_scaled(u, p)
    d0 = float((n + 1) ** 2)  # 1/dx²: the dx²-scaled residual's time unit

    print("\n2-D Bratu λ=6.8 (fold at 6.808), rough starts amp·sin(πx)sin(πy):")
    print(f"{'amp':>5} {'newton outers':>14} {'ptc outers':>11}")
    for amp in (1.5, 2.0, 2.5, 3.0):
        u0 = amp * jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)
        _, info_n = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p, algo="gmres",
            tol_rel=1e-10, M=fft_poisson(), max_niter=50)
        _, info_p = pseudo_transient(
            negF, u0, p, algo="gmres", tol_rel=1e-10, M=fft_poisson(),
            delta0=d0, max_steps=60)
        print(f"{amp:5.1f} {int(info_n.stats.outer_iterations):>14} "
              f"{int(info_p.stats.outer_iterations):>11}")
        assert bool(info_p.solved)
        assert int(info_p.stats.outer_iterations) <= int(info_n.stats.outer_iterations)


if __name__ == "__main__":
    arctan_comparison()
    bratu_rough_starts()
