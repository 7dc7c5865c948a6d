"""Probe: preconditioner lanes on the real chip (df32 refined driver).

Marginal ms/solve at 1024/2048 for plain CG, exact DST-PCG, Chebyshev-PCG
(fused Pallas polynomial), and the two-grid (Pallas Chebyshev smoother +
half-resolution DST).  Scalar-sync timing (block_until_ready is advisory
through the tunnel — bench.py discipline).
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.precond import chebyshev, two_grid
from newtonkrylov_tpu.problems import bratu2d


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def marginal(fn, u0, reps=3):
    u, info = fn(u0)
    float(info.stats.n_res)  # sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        u, info = fn(u0)
        float(info.stats.n_res)
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms, info


def lane(n, lam, M=None, label="plain"):
    p = bratu2d.default_config(n, lam=lam)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    kw = dict(algo="cg", tol_rel=1e-8, max_niter=30,
              residual_df=bratu2d.residual_scaled_df)
    if M is not None:
        kw["M"] = M
    fn = jax.jit(lambda u: newton_krylov_jit(bratu2d.residual_scaled, u, p, **kw))
    ms, info = marginal(lambda u: fn(u), u0)
    log(f"n={n} {label:18s}: {ms:8.1f} ms  solved={bool(info.solved)} "
        f"outer={int(info.stats.outer_iterations)} inner={int(info.stats.inner_iterations)}")
    return ms


def main():
    log(f"device: {jax.devices()[0]}")
    for n in (1024, 2048):
        lane(n, 5.0, M=fft_poisson(), label="DST-PCG")
        for deg in (4, 8, 16):
            lane(n, 5.0, M=two_grid(smoother_degree=deg),
                 label=f"two-grid({deg})")
        lane(n, 5.0, M=chebyshev(degree=16), label="cheb(16)-CG")


if __name__ == "__main__":
    main()
