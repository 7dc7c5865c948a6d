"""Adjudicate the reference's BVP recipe (VERDICT r1 weak #5).

The reference solves the Kelley2022 two-point BVP with FGMRES + a nested
GMRES(itmax=30) right preconditioner (examples/bvp.jl:54-58) and never
asserts convergence.  Round 1 claimed the recipe stalls (indefinite
spectrum); this script records the evidence under Krylov.jl-equivalent
semantics, CPU f64:

* outer FGMRES: NON-restarted (restart=None with a full-dimension static
  basis, m = 2n = 1602 — Krylov.jl's growing workspace taken to its
  maximum), atol = √eps(f64) (Krylov.jl default), rtol = η from
  Eisenstat–Walker exactly as the reference's newton_krylov! wires it
  (src/Ariadne.jl:330-338);
* inner preconditioner: gmres(J, x; itmax=30) with Krylov.jl defaults
  (atol = rtol = √eps, one non-restarted 30-dim cycle);
* Newton loop: reference defaults (tol_rel 1e-6, tol_abs 1e-12,
  max_niter 50, s = 1, no line search).

Also records, for contrast, the same run with the shipped robust recipe
(pivoted banded LU(2,2)) and with Armijo globalization.

Usage: python benchmarks/bvp_adjudicate.py   (writes
benchmarks/bvp_adjudication.json; the docs/parity.md section quotes it)
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import newtonkrylov_tpu as nk  # noqa: E402
from newtonkrylov_tpu import precond  # noqa: E402
from newtonkrylov_tpu.problems import bvp  # noqa: E402

SQ_EPS = math.sqrt(2.220446049250313e-16)


def run(tag, **kwargs):
    p = bvp.default_config()
    hist = []
    u, info = nk.newton_krylov(
        bvp.residual, bvp.initial_guess(p), p,
        callback=lambda u, r, n: hist.append(float(n)),
        **kwargs,
    )
    rec = {
        "solved": bool(info.solved),
        "outer": int(info.stats.outer_iterations),
        "inner": int(info.stats.inner_iterations),
        "final_norm": float(info.stats.n_res),
        "residual_history": hist,
    }
    print(f"[{tag}] solved={rec['solved']} outer={rec['outer']} "
          f"inner={rec['inner']} |F|={rec['final_norm']:.3e}")
    print("   history:", " ".join(f"{h:.3e}" for h in hist))
    return rec


def main():
    results = {}

    # --- the reference's literal recipe, Krylov.jl semantics ---------------
    results["reference_recipe_fgmres_nested_gmres30"] = run(
        "reference recipe",
        algo="fgmres",
        # nested_krylov's internal restart=min(itmax, 40)=30 → ONE 30-dim
        # cycle, i.e. exactly Krylov.jl's non-restarted gmres(J, x; itmax=30)
        N=precond.nested_krylov("gmres", itmax=30, atol=SQ_EPS, rtol=SQ_EPS),
        krylov_kwargs={"restart": None, "itmax": 2 * 801, "atol": SQ_EPS},
        max_niter=50,
    )

    # --- same, unpreconditioned full FGMRES (isolates the preconditioner) --
    results["unpreconditioned_full_gmres"] = run(
        "unpreconditioned",
        algo="gmres",
        krylov_kwargs={"restart": None, "itmax": 2 * 801, "atol": SQ_EPS},
        max_niter=50,
    )

    # --- shipped robust recipe ----------------------------------------------
    results["banded_lu_armijo"] = run(
        "banded LU + armijo",
        algo="gmres", N=precond.banded_lu(2, 2), linesearch="armijo",
    )
    results["banded_lu_plain"] = run(
        "banded LU, s=1",
        algo="gmres", N=precond.banded_lu(2, 2),
    )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bvp_adjudication.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
