"""Minimal repro for the f64-inside-while-body slowdown (solve_bisect.py).

newton_krylov_jit's refined body costs ~3.9 ms/outer more than the sum of
its parts at 1024², and the bisect pinned the residue to the f64 segment
(cast-up + u update + residual + norm).  This script rebuilds that body by
hand inside a bare lax.while_loop and ablates one ingredient at a time.

Run:  python benchmarks/while_anatomy.py [n]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, ".")
from newtonkrylov_tpu.problems import bratu2d  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LAM = 5.0
REPEATS = 3
K_SHORT, K_LONG = 3, 24


def per_iter(tag, body_fn, init, use_while=True):
    """us/iteration of a while loop running exactly k iterations."""

    def prog(init, sel):
        def run(kmax):
            if use_while:
                def cond(c):
                    return c[0] <= kmax

                fin = lax.while_loop(cond, body_fn, init)
            else:
                fin = lax.fori_loop(0, kmax + 1, lambda i, c: body_fn(c), init)
            return sum(jnp.sum(l).astype(jnp.float32) * 1e-9
                       for l in jax.tree.leaves(fin))

        return lax.cond(sel == 0, lambda: run(K_SHORT), lambda: run(K_LONG))

    f = jax.jit(prog)
    float(f(init, 0)); float(f(init, 1))

    def best(sel):
        ts = []
        for r in range(REPEATS):
            ir = jax.tree.map(
                lambda l: l * (1.0 + 1e-8 * (r + 1))
                if l.dtype in (jnp.float32, jnp.float64) else l, init)
            t0 = time.perf_counter()
            float(f(ir, sel))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    us = (best(1) - best(0)) / (K_LONG - K_SHORT) * 1e6
    print(f"{tag:46s} {us:9.1f} us/iter", flush=True)
    return us


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    p = bratu2d.default_config(N, lam=LAM)
    u64 = bratu2d.initial_guess(N, dtype=jnp.float64)
    F = bratu2d.residual_scaled
    res0 = F(u64, p)
    n0 = jnp.linalg.norm(res0)
    c2 = p.dx * p.dx * p.lam

    counter = jnp.zeros((), jnp.int32)

    # --- full refined-body replica (no Krylov; d = 1e-9 * cast-up of f32 jvp)
    def body_full(c):
        k, u, res, nres = c
        u32 = u.astype(jnp.float32)
        d32 = F(u32, p)  # stands in for the f32 inner solve output
        d = d32.astype(jnp.float64) * 1e-9
        u_new = u - d
        res_new = F(u_new, p)
        n_new = jnp.linalg.norm(res_new)
        return (k + 1, u_new, res_new, n_new)

    per_iter("replica: f32 seg + f64 update+res+norm", body_full,
             (counter, u64, res0, n0))

    # --- ablations -----------------------------------------------------------
    def body_no_f32(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("no f32 segment (pure f64 body)", body_no_f32,
             (counter, u64, res0, n0))

    def body_no_norm(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, nres * 0.5 + jnp.sum(res_new) * 1e-20)

    per_iter("f64 body, sum instead of norm", body_no_norm,
             (counter, u64, res0, n0))

    def body_no_exp(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        up = jnp.pad(u_new, 1)
        st = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2]
              - 4.0 * u_new)
        res_new = st + c2 * u_new  # linearized: no exp
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("f64 body, exp -> linear", body_no_exp,
             (counter, u64, res0, n0))

    def body_exp_only(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        res_new = c2 * jnp.exp(u_new) - 4.0 * u_new
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("f64 body, exp but no stencil/pad", body_exp_only,
             (counter, u64, res0, n0))

    def body_roll(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        st = (jnp.roll(u_new, 1, 0) + jnp.roll(u_new, -1, 0)
              + jnp.roll(u_new, 1, 1) + jnp.roll(u_new, -1, 1) - 4.0 * u_new)
        res_new = st + c2 * jnp.exp(u_new)  # BC-less: timing shape only
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("f64 body, pad -> roll", body_roll,
             (counter, u64, res0, n0))

    # same full replica under fori_loop (runtime bound) instead of while_loop
    def body_full_fori(c):
        return body_full(c)

    per_iter("replica under fori_loop", body_full_fori,
             (counter, u64, res0, n0), use_while=False)

    # f32 control
    u32 = u64.astype(jnp.float32)
    r32 = F(u32, p)

    def body_f32(c):
        k, u, res, nres = c
        u_new = u - res * jnp.float32(1e-9)
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("f32 control (same body)", body_f32,
             (counter, u32, r32, jnp.linalg.norm(r32)))


if __name__ == "__main__":
    main()
