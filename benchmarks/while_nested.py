"""Confirm the f64 × nested-while interaction (follow-up to while_anatomy).

while_anatomy.py showed the refined body's ingredients cost ~0.3 ms/outer in
a flat while loop, yet newton_krylov_jit's body (which nests the CG
while_loop) costs ~4.7 ms/outer.  Hypothesis: an XLA while body that mixes
emulated-f64 ops with a NESTED while loop loses fusion/in-place on the f64
segment.  Variants:

  flat          f64 update+res+norm, no nesting          (control ~0.3 ms)
  nested-f32    + a nested f32 while loop (1 jvp/iter)
  nested-first  nested loop BEFORE the f64 segment (driver's real order)

Run:  python benchmarks/while_nested.py [n]
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


def per_iter(tag, body_fn, init):
    def prog(init, sel):
        def run(kmax):
            fin = lax.while_loop(lambda c: c[0] <= kmax, body_fn, init)
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
    print(f"{tag:44s} {us:9.1f} us/iter", flush=True)


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    p = bratu2d.default_config(N, lam=LAM)
    u64 = bratu2d.initial_guess(N, dtype=jnp.float64)
    F = bratu2d.residual_scaled
    res0 = F(u64, p)
    n0 = jnp.linalg.norm(res0)
    counter = jnp.zeros((), jnp.int32)
    init = (counter, u64, res0, n0)

    def inner_f32(u32, niter):
        # stands in for the CG while loop: niter dependent f32 stencil applies
        def icond(s):
            return s[0] < niter

        def ibody(s):
            i, x = s
            return (i + 1, F(x, p) * jnp.float32(0.125))

        return lax.while_loop(icond, ibody, (jnp.zeros((), jnp.int32), u32))[1]

    def body_flat(c):
        k, u, res, nres = c
        u_new = u - res * 1e-9
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("flat f64 body (control)", body_flat, init)

    def body_nested(c):
        k, u, res, nres = c
        d = inner_f32(u.astype(jnp.float32), 1)
        u_new = u - res * 1e-9 - d.astype(jnp.float64) * 1e-12
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("nested f32 while + f64 segment", body_nested, init)

    def body_nested8(c):
        k, u, res, nres = c
        d = inner_f32(u.astype(jnp.float32), 8)
        u_new = u - res * 1e-9 - d.astype(jnp.float64) * 1e-12
        res_new = F(u_new, p)
        return (k + 1, u_new, res_new, jnp.linalg.norm(res_new))

    per_iter("nested (8 inner iters) + f64 segment", body_nested8, init)

    def body_nested_f32only(c):
        k, u, res, nres = c
        u32, r32, n32 = (c[1].astype(jnp.float32), c[2].astype(jnp.float32),
                         c[3].astype(jnp.float32))
        d = inner_f32(u32, 1)
        u_new32 = u32 - r32 * jnp.float32(1e-9) - d * jnp.float32(1e-12)
        res_new32 = F(u_new32, p)
        return (k + 1, u_new32.astype(jnp.float64),
                res_new32.astype(jnp.float64),
                jnp.linalg.norm(res_new32).astype(jnp.float64))

    per_iter("nested, body all-f32 (cast at edges)", body_nested_f32only, init)


if __name__ == "__main__":
    main()
