"""1-D Bratu solver-recipe gallery (mirrors examples/bratu.jl).

N=10000, lambda=3.51382, u0=sin(pi x); recipes: CG (recommended), fixed /
disabled forcing, GMRES+ILU(0), GMRES+banded-direct (the TPU-native exact
variant), FGMRES+nested-GMRES.  Error is checked against the cosh closed
form.

The gallery also prints the reference's NEGATIVE recipes
(examples/bratu.jl:110-118, 159-177): plain restarted GMRES stalls without
a preconditioner at this conditioning (κ ~ N²), and bicgstab/cgls fail —
the divergence table is part of the reference's pedagogy, reproduced here
with bounded work (tests/test_robustness.py pins the underlying solver
flags).
"""

import _common  # noqa: F401
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import Fixed, newton_krylov, precond
from newtonkrylov_tpu.problems import bratu1d


def run(tag, expect_fail=False, **kw):
    n = 10_000
    p = bratu1d.default_config(n)
    u, info = newton_krylov(bratu1d.residual, bratu1d.initial_guess(n), p, **kw)
    err = float(jnp.max(jnp.abs(u - bratu1d.true_solution(bratu1d.grid(n)))))
    note = "  (expected: does NOT converge)" if expect_fail else ""
    print(f"{tag:28s} solved={str(bool(info.solved)):5s} outer={info.stats.outer_iterations:3d} "
          f"inner={info.stats.inner_iterations:6d} max|u-u*|={err:.2e} t={info.t:.2f}s{note}")
    if expect_fail and bool(info.solved):
        raise AssertionError(f"negative recipe {tag!r} unexpectedly converged")
    return u


def main():
    u = run("cg (recommended)", algo="cg")
    run("cg + Fixed(0.1)", algo="cg", forcing=Fixed(0.1))
    run("cg + exact Newton", algo="cg", forcing=None)
    run("gmres + ILU0 (host C++)", algo="gmres", N=precond.ilu0(bandwidth=1))
    run("gmres + banded direct", algo="gmres", N=precond.banded_direct())

    # --- negative recipes (examples/bratu.jl:110-118,159-177) -------------
    print("--- negative recipes (reference divergence table) ---")
    run("gmres, NO preconditioner", expect_fail=True, algo="gmres",
        max_niter=4, krylov_kwargs={"restart": 20, "itmax": 60})
    run("bicgstab", expect_fail=True, algo="bicgstab",
        max_niter=4, krylov_kwargs={"itmax": 60})
    run("cgls", expect_fail=True, algo="cgls",
        max_niter=4, krylov_kwargs={"itmax": 60})

    n = 10_000
    x = np.asarray(bratu1d.grid(n))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(x, np.asarray(bratu1d.initial_guess(n)), label="initial guess sin(πx)")
    ax.plot(x, np.asarray(bratu1d.true_solution(bratu1d.grid(n))), label="analytic")
    ax.plot(x, np.asarray(u), "--", label="Newton–Krylov")
    ax.legend()
    ax.set_title("1-D Bratu, N=10000, λ=3.51382")
    _common.save_plot(fig, "bratu1d.png")


if __name__ == "__main__":
    main()
