"""Bisect the unattributed ~4 ms/outer in the refined DST-PCG solve.

solve_profile.py found the measured outer-body cost (5.05 ms at 1024²) is 5×
the sum of its parts (~1.0 ms).  This script measures the per-outer cost of
controlled variants of the same solve — toggling precision, preconditioner,
forcing, and inner-iteration count — to locate the residue.  Same timing
discipline: max_niter 3-vs-24 differencing with tol=0 (exactly max_niter+1
outers), scalar sync, perturbed inputs.

Run:  python benchmarks/solve_bisect.py [n]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, ".")
from newtonkrylov_tpu import newton_krylov_jit  # noqa: E402
from newtonkrylov_tpu.fftprec import fft_poisson  # noqa: E402
from newtonkrylov_tpu.forcing import EisenstatWalker, Fixed  # noqa: E402
from newtonkrylov_tpu.problems import bratu2d  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LAM = 5.0
REPEATS = 3
K_SHORT, K_LONG = 3, 24


def per_outer(tag, u0, **kwargs):
    def prog(u0, sel):
        def run(kmax):
            _, info = newton_krylov_jit(
                bratu2d.residual_scaled, u0, bratu2d.default_config(N, lam=LAM),
                tol_rel=0.0, tol_abs=0.0, max_niter=kmax, **kwargs,
            )
            return (info.stats.inner_iterations.astype(jnp.float32)
                    + info.stats.n_res.astype(jnp.float32) * 1e-9)

        return lax.cond(sel == 0, lambda: run(K_SHORT), lambda: run(K_LONG))

    f = jax.jit(prog)
    float(f(u0, 0)); float(f(u0, 1))

    def best(sel):
        ts, out = [], None
        for r in range(REPEATS):
            ur = u0 * (1.0 + 1e-8 * (r + 1))
            t0 = time.perf_counter()
            out = float(f(ur, sel))
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    ts_, is_ = best(0)
    tl_, il_ = best(1)
    diff = K_LONG - K_SHORT
    us = (tl_ - ts_) / diff * 1e6
    inner = (int(il_) - int(is_)) / diff
    print(f"{tag:44s} {us:9.1f} us/outer  ({inner:.2f} inner/outer)", flush=True)
    return us


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    u64 = bratu2d.initial_guess(N, dtype=jnp.float64)
    u32 = u64.astype(jnp.float32)
    itmax1 = {"itmax": 1}

    per_outer("full: f64+refine f32, DST, EW, cg",
              u64, algo="cg", krylov_dtype=jnp.float32, M=fft_poisson(),
              forcing=EisenstatWalker())
    per_outer("fixed forcing (else full)",
              u64, algo="cg", krylov_dtype=jnp.float32, M=fft_poisson(),
              forcing=Fixed(0.1))
    per_outer("itmax=1 (else full)",
              u64, algo="cg", krylov_dtype=jnp.float32, M=fft_poisson(),
              forcing=EisenstatWalker(), krylov_kwargs=itmax1)
    per_outer("no M, itmax=1 (else full)",
              u64, algo="cg", krylov_dtype=jnp.float32, M=None,
              forcing=EisenstatWalker(), krylov_kwargs=itmax1)
    per_outer("all-f32 solve, DST, EW (u0 f32)",
              u32, algo="cg", krylov_dtype=None, M=fft_poisson(),
              forcing=EisenstatWalker())
    per_outer("all-f32, no M, itmax=1",
              u32, algo="cg", krylov_dtype=None, M=None,
              forcing=EisenstatWalker(), krylov_kwargs=itmax1)
    per_outer("all-f64 solve, DST, EW (no refine)",
              u64, algo="cg", krylov_dtype=None, M=fft_poisson(),
              forcing=EisenstatWalker())


if __name__ == "__main__":
    main()
