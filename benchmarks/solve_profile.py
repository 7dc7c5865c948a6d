"""Per-phase cost attribution for the flagship refined solve (VERDICT r1 #2).

Where do the ~35 ms of a DST-PCG refined solve at 1024² go, when the
underlying math (8 outers × ~1 inner) is a few ms of matvecs?  This script
measures each phase of the `newton_krylov_jit` outer body separately on the
real TPU, with the same timing discipline as bench.py (runtime-length chains
inside one compiled program, scalar sync, input perturbation, short/long
differencing), and then the whole outer body, so the attribution can be
checked against the total.

Phases (per outer iteration of the krylov_dtype=f32 refined path):

  cast_down     u(f64) -> f32, RHS cast
  linearize     jax.linearize of the f32 residual (primal eval + JVP build)
  probe_factory probe_5point + DST factory setup (eigenvalues, sine bases)
  dst_apply     one M⁻¹ application (4 sine-basis matmuls + scale)
  cg_iter       one full PCG iteration (matvec + M⁻¹ + 2 dots + 3 axpys)
  f64_residual  residual eval at f64 (XLA-emulated) — the acceptance eval
  f64_update    u ← u − d and the f64 norm
  outer_body    everything above + forcing/history, measured as a whole

Run:  python benchmarks/solve_profile.py [n]
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
from newtonkrylov_tpu.mg import probe_5point  # noqa: E402
from newtonkrylov_tpu.operator import JacobianOperator  # noqa: E402
from newtonkrylov_tpu.problems import bratu2d  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
PRECISION = sys.argv[2] if len(sys.argv) > 2 else "highest"  # DST matmul mode
REFRESH = sys.argv[3] if len(sys.argv) > 3 else "outer"      # factory refresh
DF32 = len(sys.argv) > 4 and sys.argv[4] == "df32"           # acceptance residual
LAM = 5.0
REPEATS = 3


def chain(fn, x0, k_long=200, tag=""):
    """us/step of x <- fn(x) via runtime-k chains in one compiled program.

    fn must be shape-preserving on x.  A tiny data dependence on the step
    index stops any dedupe; fixed overhead cancels in the k-difference.
    """
    def prog(x, k):
        def body(i, x):
            return fn(x)
        out = lax.fori_loop(0, k, body, x)
        return jnp.sum(jnp.stack([jnp.sum(l) for l in jax.tree.leaves(out)])).astype(jnp.float32)

    f = jax.jit(prog)
    ks, kl = max(1, k_long // 10), k_long
    float(f(x0, ks)); float(f(x0, kl))

    def best(k):
        ts = []
        for r in range(REPEATS):
            xr = jax.tree.map(lambda l: l * (1.0 + 1e-6 * (r + 1)), x0)
            t0 = time.perf_counter()
            float(f(xr, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    us = (best(kl) - best(ks)) / (kl - ks) * 1e6
    print(f"{tag:22s} {us:10.2f} us/step", flush=True)
    return us


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    p = bratu2d.default_config(N, lam=LAM)
    u64 = bratu2d.initial_guess(N, dtype=jnp.float64)
    u32 = u64.astype(jnp.float32)
    F = bratu2d.residual_scaled

    # --- phase: f32 residual / linearize / jvp ------------------------------
    t_res32 = chain(lambda x: F(x, p) * 0.125 + x * 1e-6, u32, tag="res eval f32")

    def lin_step(x):
        y, jvp = jax.linearize(lambda uu: F(uu, p), x)
        return x * 0.99999 + y * 1e-7 + jvp(x) * 1e-9

    t_lin = chain(lin_step, u32, tag="linearize+jvp f32")

    _, jvp32 = jax.linearize(lambda uu: F(uu, p), u32)
    t_jvp = chain(lambda x: jvp32(x) * 0.125, u32, tag="jvp apply f32")

    # --- phase: probe + DST factory and one apply ---------------------------
    Mfac = fft_poisson(precision=PRECISION)

    def factory_step(x):
        J = JacobianOperator(F, x, p)
        apply_ = Mfac(J)
        return x * 0.99999 + apply_(x) * 1e-9

    t_fac = chain(factory_step, u32, k_long=60, tag="probe+factory+apply")

    J32 = JacobianOperator(F, u32, p)
    o, d = probe_5point(J32)
    t_probe = chain(
        lambda x: x * 0.99999
        + probe_5point(JacobianOperator(F, x, p))[1] * 1e-9,
        u32, k_long=60, tag="probe_5point",
    )
    apply32 = Mfac(J32)
    t_dst = chain(lambda x: apply32(x) * 0.125, u32, k_long=100, tag="dst apply f32")

    # --- phase: one PCG iteration (matvec + M + dots + axpys) ---------------
    def cg_iter(state):
        x, r, pk, rz = state
        Ap = jvp32(pk)
        alpha = rz / jnp.vdot(pk, Ap)
        x = x + alpha * pk
        r = r - alpha * Ap
        z = apply32(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        pk = z + beta * pk
        return (x * 0.99999, r * 0.99999, pk * 0.99999, rz_new * 0.5 + rz * 0.1)

    r0 = F(u32, p)
    z0 = apply32(r0)
    st0 = (jnp.zeros_like(u32), r0, z0, jnp.vdot(r0, z0))
    t_cg = chain(cg_iter, st0, k_long=100, tag="pcg iteration f32")

    # --- phase: f64 pieces ---------------------------------------------------
    t_res64 = chain(lambda x: F(x, p) * 0.125 + x * 1e-9, u64, k_long=60,
                    tag="res eval f64")
    t_norm64 = chain(
        lambda x: x * 0.99999 + jnp.linalg.norm(F(x, p)) * 1e-9, u64,
        k_long=60, tag="res+norm f64",
    )
    t_upd64 = chain(lambda x: x - 1e-9 * (x * 1.5), u64, k_long=200,
                    tag="u update f64")
    t_cast = chain(lambda x: x + x.astype(jnp.float32).astype(jnp.float64) * 1e-9,
                   u64, k_long=200, tag="f64<->f32 cast pair")

    if DF32:
        # the production acceptance residual: paired-f32, no emulated-f64 op
        from newtonkrylov_tpu import df32 as _dd
        u_df = _dd.df_from_f64(u64)
        t_res_df = chain(
            lambda xd: _dd.scale_pow2(bratu2d.residual_scaled_df(xd, p), 0.125),
            u_df, k_long=60, tag="res eval df32",
        )

    # --- whole outer body, measured via max_niter differencing --------------
    # tol_rel=tol_abs=0 forces exactly (max_niter+1) outer iterations.
    def solve_prog(u0, kmax_sel):
        def run(kmax):
            _, info = newton_krylov_jit(
                F, u0, p, algo="cg", tol_rel=0.0, tol_abs=0.0,
                krylov_dtype=jnp.float32, max_niter=kmax,
                M=fft_poisson(precision=PRECISION), precond_refresh=REFRESH,
                residual_df=bratu2d.residual_scaled_df if DF32 else None,
            )
            return info.stats.inner_iterations.astype(jnp.float32) + info.stats.n_res.astype(jnp.float32) * 1e-9

        return lax.cond(kmax_sel == 0, lambda: run(3), lambda: run(24))

    fsolve = jax.jit(solve_prog)
    float(fsolve(u64, 0)); float(fsolve(u64, 1))

    def best_solve(sel):
        ts, inner = [], None
        for r in range(REPEATS):
            ur = u64 * (1.0 + 1e-8 * (r + 1))
            t0 = time.perf_counter()
            inner = float(fsolve(ur, sel))
            ts.append(time.perf_counter() - t0)
        return min(ts), inner

    t3, i3 = best_solve(0)
    t24, i24 = best_solve(1)
    t_outer = (t24 - t3) / (24 - 3) * 1e6
    inner_per_outer = (int(i24) - int(i3)) / (24 - 3)
    print(f"{'outer body (measured)':22s} {t_outer:10.2f} us/outer  "
          f"({inner_per_outer:.2f} inner/outer)")

    # --- attribution ---------------------------------------------------------
    t_accept = t_res_df if DF32 else t_norm64
    t_factory = t_fac if REFRESH == "outer" else t_dst  # once: apply only
    rows = [
        ("cast f64<->f32", 0.0 if DF32 else t_cast),
        ("linearize+jvp", t_lin),
        ("factory" if REFRESH == "outer" else "hoisted M apply", t_factory),
        (f"{inner_per_outer:.1f} x pcg iter", inner_per_outer * t_cg),
        ("acceptance residual", t_accept),
        ("u update", t_upd64),
    ]
    pred = sum(v for _, v in rows)
    print(f"\n--- attribution (per outer iteration; precision={PRECISION}, "
          f"refresh={REFRESH}, df32={DF32}) ---")
    for tag, v in rows:
        print(f"  {tag:22s} {v:10.2f} us  ({100*v/t_outer:5.1f}% of measured)")
    print(f"  {'predicted total':22s} {pred:10.2f} us  vs measured {t_outer:.2f}")


if __name__ == "__main__":
    main()
