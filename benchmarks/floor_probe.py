"""Measure the df32 acceptance floor and candidate a-priori estimators.

Round-5 instrumentation for VERDICT r4 items 1 & 8: the 4096² flagship's
`solved` flag was a coin flip because tol ≈ the paired-f32 acceptance floor.
Before wiring a floor guard into the drivers we need to know (a) what the
floor actually *is* per size (drive the solve far past tol and record where
‖F‖ plateaus), and (b) which cheap solve-start probe tracks it.

Probes, all one residual_df eval + one norm:
  P_coh  — coherent ulp perturbation:      ‖F(u ⊕ ε_dd·|u|) − F(u)‖
  P_chk  — checkerboard ulp perturbation:  ‖F(u ⊕ ±ε_dd·|u|) − F(u)‖ (worst
           case for the stencil: the (−1)^{i+j} mode maxes |S(δ)−4δ|)
  P_rnd  — pseudo-random-sign perturbation (sign from a hash of the index)
evaluated at u0 AND at the converged state u*.

Run:  python benchmarks/floor_probe.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax

from newtonkrylov_tpu import df32 as dd
from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.fftprec import fft_poisson
from newtonkrylov_tpu.problems import bratu2d

LAM = 5.0
EPS_DD = 2.0 ** -47


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probes(n):
    p = bratu2d.default_config(n, lam=LAM)

    def signs(kind, shape):
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        if kind == "coh":
            return jnp.ones(shape, jnp.float32)
        if kind == "chk":
            return jnp.where((rows + cols) % 2 == 0, 1.0, -1.0).astype(jnp.float32)
        h = (rows * 2654435761 + cols * 40503) & 0xFFFF
        return jnp.where(h % 2 == 0, 1.0, -1.0).astype(jnp.float32)

    @jax.jit
    def probe_all(u_df):
        r0 = bratu2d.residual_scaled_df(u_df, p)
        out = {}
        for kind in ("coh", "chk", "rnd"):
            delta = jnp.abs(u_df.hi) * np.float32(EPS_DD) * signs(kind, u_df.hi.shape)
            u1 = dd.tree_add_f32(u_df, delta)
            r1 = bratu2d.residual_scaled_df(u1, p)
            out[kind] = jnp.linalg.norm(dd.sub(r1, r0).hi)
        # the production estimator: one f32 forward-mode tangent (robust to
        # cross-program fusion jitter, unlike the differencing probes above)
        out["jvp"] = dd.floor_estimate(
            bratu2d.residual_scaled, u_df.hi.astype(jnp.float32), p
        )
        return out

    return probe_all


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 4096]
    for n in sizes:
        p = bratu2d.default_config(n, lam=LAM)
        u0 = bratu2d.initial_guess(n, dtype=jnp.float64)

        # Drive the solve far past any reachable tolerance: tol_rel=0,
        # tol_abs ~ 0 — the loop runs max_niter outers and the history
        # records where ‖F‖ plateaus.
        def solve(u_in):
            return newton_krylov_jit(
                bratu2d.residual_scaled, u_in, p,
                algo="cg", tol_rel=0.0, tol_abs=1e-30,
                krylov_dtype=jnp.float32,
                residual_df=bratu2d.residual_scaled_df,
                max_niter=14, M=fft_poisson(precision="high"),
                precond_refresh="once",
            )

        t0 = time.perf_counter()
        u, info = jax.jit(solve)(u0)
        hist = np.asarray(info.history)
        log(f"n={n}: solve+compile {time.perf_counter()-t0:.1f}s "
            f"outers={int(info.stats.outer_iterations)}")
        hist = hist[np.isfinite(hist)]
        nF0 = hist[0]
        floor = hist.min()
        log(f"n={n}: |F0|={nF0:.3e} plateau(min |F|)={floor:.3e} "
            f"rel={floor/nF0:.3e}  tail={['%.3e' % h for h in hist[-6:]]}")

        pr = probes(n)
        u0_df = dd.df_from_f64(u0)
        us_df = dd.df_from_f64(u)
        out0 = {k: float(v) for k, v in pr(u0_df).items()}
        outs = {k: float(v) for k, v in pr(us_df).items()}
        log(f"n={n}: probes at u0  " +
            " ".join(f"{k}={v:.3e}" for k, v in out0.items()))
        log(f"n={n}: probes at u*  " +
            " ".join(f"{k}={v:.3e}" for k, v in outs.items()))
        # residual lo-word norm at u*
        r_star = jax.jit(lambda ud: bratu2d.residual_scaled_df(ud, p))(us_df)
        log(f"n={n}: |lo(F(u*))|={float(jnp.linalg.norm(r_star.lo)):.3e} "
            f"|hi(F(u*))|={float(jnp.linalg.norm(r_star.hi)):.3e}")


if __name__ == "__main__":
    main()
