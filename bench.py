"""TPU benchmark: 2-D Bratu Jv matvec throughput + full JFNK solve.

Prints ONE JSON line:
  {"metric": "bratu2d_jv_matvecs_per_s_chip", "value": N, "unit": "matvec/s",
   "vs_baseline": F}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
fraction of the single-chip speed-of-light implied by HBM bandwidth: one
linearized stencil-JVP touches ~12 B/point (read tangent, read cached
d(λΔx²eᵘ), write output; neighbor reads hit VMEM/cache), and a v5e chip
streams ~819 GB/s.  vs_baseline = achieved / (BW / 12·N).

Secondary numbers (full JFNK solve wall-clock, per-iteration cost) go to
stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.problems import bratu2d

N = 2048
LAM = 5.0
CHAIN = 200          # matvecs per timed program
REPEATS = 5



def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}, platform: {jax.default_backend()}")

    p = bratu2d.default_config(N, lam=LAM)
    u0 = bratu2d.initial_guess(N, dtype=jnp.float32)

    # --- Jv matvec throughput on the linearized residual -------------------
    #
    # Timing discipline for the remote-attached chip: block_until_ready does
    # not actually block through the tunnel and eager ops are expensive, so
    # every timed program returns a 4-byte scalar that is materialized with
    # float() as the sync point, and the fixed dispatch/transfer overhead is
    # cancelled by differencing two chain lengths.
    def make_chain(k):
        @jax.jit
        def chain(u, v):
            _, jvp = jax.linearize(lambda uu: bratu2d.residual_scaled(uu, p), u)

            def body(i, v):
                return jvp(v) * 0.125  # keep magnitudes bounded

            out = lax.fori_loop(0, k, body, v)
            return jnp.sum(out)

        return chain

    short, long_ = CHAIN // 10, CHAIN
    chain_s, chain_l = make_chain(short), make_chain(long_)
    v0 = jnp.ones_like(u0)
    float(chain_s(u0, v0))  # compile
    float(chain_l(u0, v0))  # compile

    def best_time(fn, a, b, reps=REPEATS):
        best = float("inf")
        for r in range(reps):
            bv = b * (1.0 + 1e-4 * (r + 1))  # vary input → no dedupe
            t0 = time.perf_counter()
            float(fn(a, bv))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = best_time(chain_s, u0, v0)
    t_long = best_time(chain_l, u0, v0)
    matvecs_per_s = (long_ - short) / max(t_long - t_short, 1e-9)
    log(f"t({short} matvecs)={t_short:.3f}s t({long_})={t_long:.3f}s")

    # --- empirical stream roofline ----------------------------------------
    # A pure 3-array elementwise loop (read a, read b, write a) measures the
    # best streaming rate this deployment actually achieves at this footprint
    # — the honest speed-of-light for a memory-bound stencil JVP, measured
    # rather than assumed (the tunnel-attached chip outruns nominal specs).
    def make_axpy(k):
        @jax.jit
        def f(a, b):
            def body(i, a):
                return a * 0.99999 + b

            return jnp.sum(lax.fori_loop(0, k, body, a))

        return f

    ax_s, ax_l = make_axpy(short), make_axpy(long_)
    float(ax_s(v0, u0)); float(ax_l(v0, u0))
    ta_s = best_time(ax_s, v0, u0)
    ta_l = best_time(ax_l, v0, u0)
    axpys_per_s = (long_ - short) / max(ta_l - ta_s, 1e-9)
    log(f"stream axpy: {1e6/axpys_per_s:.2f} us/iter ({axpys_per_s:.0f}/s)")

    # Both loops move 3 arrays per iteration, so the ratio of rates is the
    # fraction of measured speed-of-light the fused stencil-JVP achieves.
    sol = axpys_per_s
    frac = matvecs_per_s / sol
    log(f"Jv matvec: {1e6/matvecs_per_s:.2f} us/matvec on {N}x{N}, "
        f"{matvecs_per_s:.1f} matvec/s (measured SoL {sol:.1f}, {100*frac:.1f}%)")

    # --- full JFNK solve ---------------------------------------------------
    @jax.jit
    def solve(u0):
        u, info = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p,
            algo="cg", tol_rel=1e-3, max_niter=30,   # f32-reachable tolerance
        )
        return jnp.sum(u), info.solved, info.stats.outer_iterations, info.stats.inner_iterations

    float(solve(u0)[0])  # compile + run
    # vary the input so the run cannot be deduped against the warmup
    u0b = u0 * (1.0 + 1e-4)
    t0 = time.perf_counter()
    s, solved, outer, inner = solve(u0b)
    float(s)
    t_solve = time.perf_counter() - t0
    solved, outer, inner = bool(solved), int(outer), int(inner)
    log(f"JFNK solve {N}x{N}: solved={solved} outer={outer} "
        f"inner={inner} wall={t_solve:.3f}s "
        f"({t_solve/max(inner,1)*1e3:.2f} ms/inner-iter)")

    print(json.dumps({
        "metric": "bratu2d_jv_matvecs_per_s_chip",
        "value": round(matvecs_per_s, 1),
        "unit": "matvec/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
