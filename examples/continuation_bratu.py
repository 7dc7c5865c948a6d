"""Natural continuation in λ for the 2-D Bratu problem, up to the fold.

The Gelfand–Bratu problem −Δu = λeᵘ has a fold at λ* ≈ 6.808 on the unit
square: below it two solution branches exist (the solver finds the lower
one), above it none.  This example walks λ toward the fold with
warm-started Newton–Krylov solves — the everyday production workflow for
parameter studies that the solver's API is shaped for:

* warm starts: each solve starts from the previous λ's solution, keeping
  Newton in its quadratic basin as the conditioning worsens toward the
  fold;
* failure detection: past the fold the solve reports ``solved=False``
  (max_niter exhausted or blow-up abort, newton.py's NaN/Inf check —
  the reference's semantics, src/Ariadne.jl:353-356) instead of raising,
  so the sweep can bisect the fold location;
* the DST preconditioner tracks the linearization point through its
  diagonal shift, staying effective as e^u grows.

Run anywhere (CPU f64 by default; set NK_TPU=1 for a chip).
"""

import _common  # noqa: F401
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.problems import bratu2d


def solve_at(lam, u0, n):
    p = bratu2d.default_config(n, lam=float(lam))
    return newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-10,
        max_niter=30, M=fft_poisson(),
    )


def main():
    n = 96
    u = bratu2d.initial_guess(n, dtype=jnp.float64)

    lams = [1.0, 3.0, 5.0, 6.0, 6.5, 6.7, 6.78, 6.80]
    peaks, outers = [], []
    for lam in lams:
        u_new, info = solve_at(lam, u, n)
        ok = bool(info.solved)
        print(f"lam={lam:5.2f}: solved={ok} outer={int(info.stats.outer_iterations)} "
              f"inner={int(info.stats.inner_iterations)} "
              f"max(u)={float(jnp.max(u_new)):.4f}")
        assert ok, f"continuation lost convergence below the fold at lam={lam}"
        u = u_new
        peaks.append(float(jnp.max(u)))
        outers.append(int(info.stats.outer_iterations))

    # Late steps stay bounded despite the worsening conditioning near the
    # fold (note tol_rel is relative to the warm-start residual, reference
    # semantics — each step earns ten fresh digits, so counts measure
    # Newton work, not closeness of the start).
    assert outers[-1] <= 10, f"near-fold step cost {outers[-1]} outers"

    # past the fold there is no solution: the solver must REPORT failure
    # (solved=False), not raise or return a spurious root
    u_bad, info_bad = solve_at(7.5, u, n)
    print(f"lam= 7.50: solved={bool(info_bad.solved)} (past the fold, expected False)")
    assert not bool(info_bad.solved)

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(lams, peaks, "o-")
    ax.axvline(6.808, ls="--", c="gray", label="fold λ* ≈ 6.808")
    ax.set_xlabel("λ")
    ax.set_ylabel("max u (lower branch)")
    ax.set_title(f"2-D Bratu continuation, {n}² grid")
    ax.legend()
    _common.save_plot(fig, "continuation_bratu.png")


if __name__ == "__main__":
    main()
