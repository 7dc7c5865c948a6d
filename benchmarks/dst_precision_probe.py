"""Probe: DST matmul precision vs flagship solve time + iteration counts.

The DST preconditioner apply is four n³ sine matmuls and dominates the
flagship lane (benchmarks/solve_profile.py).  Precision HIGHEST (f32, 6
bf16 MXU passes) vs DEFAULT (1 bf16 pass): the preconditioner only needs
~1% accuracy to preserve CG iteration counts, so DEFAULT should cut the
apply ~6x if counts hold.  Scalar-sync marginal timing (bench.py
discipline: chain differencing to cancel ~fixed dispatch).
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.precond import two_grid
from newtonkrylov_tpu.problems import bratu2d

LAM = 5.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_chain_solve(n, M):
    p = bratu2d.default_config(n, lam=LAM)

    @jax.jit
    def f(u0, k):
        def body(i, acc):
            u_in = u0 * (1.0 + 1e-6 * (i + 1)) + 1e-30 * acc
            u, info = newton_krylov_jit(
                bratu2d.residual_scaled, u_in, p,
                algo="cg", tol_rel=1e-8, krylov_dtype=jnp.float32,
                residual_df=bratu2d.residual_scaled_df,
                max_niter=20, M=M,
            )
            return acc + jnp.sum(u) + info.stats.inner_iterations
        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float64))
    return f


def lane(n, M, label):
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    p = bratu2d.default_config(n, lam=LAM)
    f = make_chain_solve(n, M)
    float(f(u0, 1)); float(f(u0, 3))  # compile + warm

    def wall(k, r):
        u = u0 * (1.0 + 1e-7 * (r + 1))
        t0 = time.perf_counter()
        float(f(u, k))
        return time.perf_counter() - t0

    t1 = min(wall(1, r) for r in range(2))
    t3 = min(wall(3, r + 2) for r in range(2))
    ms = max(t3 - t1, 0.0) / 2 * 1e3
    u, info = jax.jit(lambda u: newton_krylov_jit(
        bratu2d.residual_scaled, u, p, algo="cg", tol_rel=1e-8,
        krylov_dtype=jnp.float32, residual_df=bratu2d.residual_scaled_df,
        max_niter=20, M=M))(u0)
    log(f"n={n} {label:22s}: {ms:8.1f} ms  solved={bool(info.solved)} "
        f"outer={int(info.stats.outer_iterations)} "
        f"inner={int(info.stats.inner_iterations)}")


def main():
    log(f"device: {jax.devices()[0]}")
    for n in (1024, 2048):
        lane(n, fft_poisson(precision="highest"), "DST f32 (highest)")
        lane(n, fft_poisson(precision="high"), "DST bf16x3 (high)")


if __name__ == "__main__":
    main()
