"""Validate + time the df32 refined solve on the real TPU (VERDICT r1 #2).

Measures per-outer cost of the residual_df path (tol=0 differencing, as in
solve_bisect.py), then the marginal wall of a REAL converged solve at 1024²
(1-vs-3 chained solves), verifying solved=True and the true f64 residual at
the returned solution.

Run:  python benchmarks/solve_df32_check.py [n]
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
from newtonkrylov_tpu.forcing import EisenstatWalker  # noqa: E402
from newtonkrylov_tpu.problems import bratu2d  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LAM = 5.0
REPEATS = 3
K_SHORT, K_LONG = 3, 24


def per_outer(tag, u0, **kwargs):
    p = bratu2d.default_config(N, lam=LAM)

    def prog(u0, sel):
        def run(kmax):
            _, info = newton_krylov_jit(
                bratu2d.residual_scaled, u0, p,
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


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    u64 = bratu2d.initial_guess(N, dtype=jnp.float64)
    p = bratu2d.default_config(N, lam=LAM)

    per_outer("df32 refined, no M, itmax=1",
              u64, algo="cg", krylov_dtype=jnp.float32,
              residual_df=bratu2d.residual_scaled_df,
              forcing=EisenstatWalker(), krylov_kwargs={"itmax": 1})
    per_outer("df32 refined, DST, EW",
              u64, algo="cg", krylov_dtype=jnp.float32,
              residual_df=bratu2d.residual_scaled_df,
              M=fft_poisson(), forcing=EisenstatWalker())

    # --- real converged solve: marginal via 1-vs-3 chaining -----------------
    def make_chain(k):
        @jax.jit
        def f(u0):
            def body(i, acc):
                u_in = u0 * (1.0 + 1e-6 * (i + 1)) + 1e-30 * acc
                u, info = newton_krylov_jit(
                    bratu2d.residual_scaled, u_in, p,
                    algo="cg", tol_rel=1e-8, krylov_dtype=jnp.float32,
                    residual_df=bratu2d.residual_scaled_df,
                    max_niter=20, M=fft_poisson(),
                )
                return acc + jnp.sum(u) + info.stats.inner_iterations
            return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float64))
        return f

    f1, f3 = make_chain(1), make_chain(3)
    float(f1(u64)); float(f3(u64))

    def best_wall(f):
        ts = []
        for r in range(2):
            t0 = time.perf_counter()
            float(f(u64 * (1.0 + 1e-7 * (r + 1))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t3 = best_wall(f1), best_wall(f3)
    print(f"df32-refined DST solve {N}x{N} to 1e-8: marginal "
          f"{(t3-t1)/2*1e3:.1f} ms/solve (single wall {t1:.3f}s)")

    # --- verification: stats + true f64 residual ----------------------------
    u, info = jax.jit(lambda u0: newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        krylov_dtype=jnp.float32, residual_df=bratu2d.residual_scaled_df,
        max_niter=20, M=fft_poisson()))(u64)
    n_true = float(jnp.linalg.norm(bratu2d.residual_scaled(u, p)))
    n0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u64, p)))
    print(f"solved={bool(info.solved)} outer={int(info.stats.outer_iterations)} "
          f"inner={int(info.stats.inner_iterations)} "
          f"true-f64 |F|/|F0| = {n_true/n0:.3e}")


if __name__ == "__main__":
    main()
