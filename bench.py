"""TPU benchmark: 2-D Bratu Jv matvec throughput + full JFNK solve.

Prints ONE JSON line:
  {"metric": "bratu2d_jv_matvecs_per_s_chip", "value": N, "unit": "matvec/s",
   "vs_baseline": F}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the *measured* streaming speed-of-light: a pure 3-array
elementwise loop at the same footprint calibrates the best rate this
deployment achieves (the tunnel-attached chip outruns nominal v5e specs and
block_until_ready does not block through the tunnel, so every timed program
returns a 4-byte scalar synced with float(), and fixed dispatch overhead is
cancelled by differencing two chain lengths).

Secondary numbers to stderr: per-path matvec timings (XLA pad-based vs fused
Pallas) and the flagship mixed-precision solve — 2-D Bratu to
‖F‖ ≤ 1e-8·‖F₀‖ via iterative refinement (f64 state/residual, f32 Krylov).
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)  # for the refined-solve benchmark

import functools

import jax.numpy as jnp
from jax import lax

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.kernels import stencil2d as K
from newtonkrylov_tpu.problems import bratu2d
from newtonkrylov_tpu.utils.profiling import time_chain as _time_chain

N = 2048
LAM = 5.0
CHAIN = 2000
REPEATS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chain(fn, a, b):
    return _time_chain(fn, a, b, chain=CHAIN, repeats=REPEATS)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {jax.default_backend()}")

    p = bratu2d.default_config(N, lam=LAM)
    u0 = bratu2d.initial_guess(N, dtype=jnp.float32)

    # --- path 1: XLA pad-based linearized JVP ------------------------------
    _, jvp = jax.linearize(lambda uu: bratu2d.residual_scaled(uu, p), u0)
    r_xla = time_chain(lambda x, b: jvp(x), u0, u0)
    log(f"xla pad-based jvp: {1e6/r_xla:.2f} us/matvec ({r_xla:.0f}/s)")

    # --- path 2: fused Pallas kernel on the aligned ghost layout -----------
    va = K.aligned_wrap(u0)
    scale = p.dx * p.dx * p.lam
    wa = scale * jnp.exp(va) * K.aligned_mask(N, va.dtype)
    pal = functools.partial(K.stencil_jvp_pallas, n=N)
    r_pal = time_chain(lambda x, b: pal(x, b), va, wa)
    log(f"pallas fused jvp:  {1e6/r_pal:.2f} us/matvec ({r_pal:.0f}/s)")

    matvecs_per_s = max(r_xla, r_pal)

    # --- empirical stream roofline (3-array traffic, same footprint) ------
    sol = time_chain(lambda x, b: x * 0.99999 + b, va, wa)
    frac = matvecs_per_s / sol
    log(f"stream axpy SoL: {1e6/sol:.2f} us/iter; best jvp at {100*frac:.1f}% of SoL")

    # --- flagship solve: ||F|| <= 1e-8 by iterative refinement -------------
    ns = 1024
    u0a, ps, space = bratu2d.aligned_setup(ns, lam=LAM, dtype=jnp.float64)

    @jax.jit
    def solve(u0a):
        u, info = newton_krylov_jit(
            lambda u, pp: bratu2d.residual_scaled_aligned(u, pp), u0a, ps,
            algo="cg", tol_rel=1e-8, space=space, krylov_dtype=jnp.float32,
            max_niter=20,
        )
        return jnp.sum(u), info.solved, info.stats.outer_iterations, info.stats.inner_iterations

    float(solve(u0a)[0])  # compile
    t0 = time.perf_counter()
    s, solved, outer, inner = solve(u0a * (1.0 + 1e-6))
    float(s)
    t_solve = time.perf_counter() - t0
    log(
        f"JFNK refined solve {ns}x{ns} to 1e-8: solved={bool(solved)} "
        f"outer={int(outer)} inner={int(inner)} wall={t_solve:.3f}s"
    )

    print(json.dumps({
        "metric": "bratu2d_jv_matvecs_per_s_chip",
        "value": round(matvecs_per_s, 1),
        "unit": "matvec/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
