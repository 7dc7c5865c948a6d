"""VPU cost-model probe for the stencil-JVP chain kernel (VERDICT r1 task 1).

Measures, inside ONE Pallas kernel with all state VMEM-resident, the
per-step cost of each ingredient of the fused stencil-JVP:

* pure elementwise arithmetic chains of varying op count (per-op cost),
* sublane rolls (axis 0) vs lane rolls (axis 1),
* fori_loop carry vs ping-pong scratch refs (loop-carry copy cost),
* the round-1 chain formulation vs restructured variants.

Timing discipline: chain differencing (k long vs k short steps in the same
kernel), scalar-sum output synced with float(), inputs perturbed per repeat
(see utils/profiling.time_chain).  Run on the real TPU:

    python benchmarks/kernel_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from newtonkrylov_tpu.kernels import stencil2d as K  # noqa: E402

# N=1024: the probe measures RELATIVE per-op costs (scale by elements for
# other sizes); at 2048 some non-ping-pong dynamic-k variants exceed the
# 128 MB VMEM — select ping-pong variants only (argv) when overriding via
# KP_N=2048.
N = int(os.environ.get("KP_N", "1024"))
KL, KS = (4000, 400) if N <= 1024 else (2000, 200)
REPEATS = 4


def _chain_call(step_builder, v, w, k, pingpong=False, unroll=1):
    """Run k dependent steps of step_builder(w)(x) with x VMEM-resident.

    ``k`` is a RUNTIME scalar (SMEM) so short/long chains share one compile —
    tunnel-remote Mosaic compiles cost minutes each.
    """
    k = jnp.asarray(k, jnp.int32).reshape(1)

    if not pingpong:
        def kernel(k_ref, v_ref, w_ref, o_ref):
            step = step_builder(w_ref[:], o_ref.shape)
            o_ref[:] = lax.fori_loop(0, k_ref[0], lambda i, x: step(x), v_ref[:])

        scratch = []
    else:
        def kernel(k_ref, v_ref, w_ref, o_ref, s_ref):
            step = step_builder(w_ref[:], o_ref.shape)

            def body(i, _):
                for _ in range(unroll):  # static unroll: 2·unroll steps/body
                    s_ref[:] = step(o_ref[:])
                    o_ref[:] = step(s_ref[:])
                return 0

            o_ref[:] = v_ref[:]
            lax.fori_loop(0, k_ref[0] // (2 * unroll), body, 0)

        scratch = [pltpu.VMEM(v.shape, v.dtype)]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )(k, v, w)


SELECT = sys.argv[1:] if len(sys.argv) > 1 else None


def time_variant(name, step_builder, v, w, **kw):
    if SELECT is not None and not any(s in name for s in SELECT):
        return float("nan")
    f = jax.jit(lambda a, b, k: jnp.sum(_chain_call(step_builder, a, b, k, **kw)))
    float(f(v, w, KS)); float(f(v, w, KL))

    def best(k):
        ts = []
        for r in range(REPEATS):
            vr = v * (1.0 + 1e-5 * (r + 1))
            t0 = time.perf_counter()
            float(f(vr, w, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    us = (best(KL) - best(KS)) / (KL - KS) * 1e6
    print(f"{name:34s} {us:8.3f} us/step", flush=True)
    return us


def main():
    print(f"device: {jax.devices()[0]}, backend: {jax.default_backend()}")
    v = K.aligned_wrap(jnp.ones((N, N), jnp.float32) * 0.1)
    w = K.aligned_wrap(jnp.full((N, N), 0.9, jnp.float32))
    R, C = v.shape
    print(f"array: {R}x{C} f32 = {R*C*4/2**20:.1f} MiB")

    # --- arithmetic-only chains: per-op cost --------------------------------
    def muls(nops):
        def build(wm, shape):
            cs = [jnp.asarray(0.999 + 1e-4 * i, jnp.float32) for i in range(nops)]

            def step(x):
                for c in cs:
                    x = x * c
                return x

            return step
        return build

    t_mul2 = time_variant("mul x2", muls(2), v, w)
    t_mul4 = time_variant("mul x4", muls(4), v, w)
    t_mul8 = time_variant("mul x8", muls(8), v, w)
    time_variant("mul x2 pingpong", muls(2), v, w, pingpong=True)
    time_variant("mul x4 pingpong", muls(4), v, w, pingpong=True)
    time_variant("mul x8 pingpong", muls(8), v, w, pingpong=True)

    # --- roll cost, each axis ----------------------------------------------
    def roll_chain(axis, nrolls):
        def build(wm, shape):
            dim = shape[axis]

            def step(x):
                for i in range(nrolls):
                    sh = 1 if i % 2 == 0 else dim - 1
                    x = pltpu.roll(x, shift=jnp.asarray(sh, jnp.int32),
                                   axis=axis) * 0.9999
                return x

            return step
        return build

    t_sub1 = time_variant("roll sublane x1 (+mul)", roll_chain(0, 1), v, w)
    t_sub4 = time_variant("roll sublane x4 (+mul)", roll_chain(0, 4), v, w)
    t_lane1 = time_variant("roll lane x1 (+mul)", roll_chain(1, 1), v, w)
    t_lane4 = time_variant("roll lane x4 (+mul)", roll_chain(1, 4), v, w)

    # --- stencil formulations ----------------------------------------------
    s = 0.125

    def cur_build(wm, shape):
        """Round-1 _chain_kernel body verbatim."""
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = (rows < N) & (cols >= 1) & (cols <= N)
        sc = jnp.asarray(s, jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        one = jnp.asarray(1, jnp.int32)

        def step(x):
            up = pltpu.roll(x, shift=one, axis=0)
            dn = pltpu.roll(x, shift=jnp.asarray(shape[0] - 1, jnp.int32), axis=0)
            left = pltpu.roll(x, shift=one, axis=1)
            right = pltpu.roll(x, shift=jnp.asarray(shape[1] - 1, jnp.int32), axis=1)
            out = up + dn + left + right + (wm - 4.0) * x
            return jnp.where(mask, out * sc, zero)

        return step

    def opt_build(wm, shape):
        """Hoisted invariants: wm4 = w-4, masks = mask*s (one mul for BC+scale)."""
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = ((rows < N) & (cols >= 1) & (cols <= N)).astype(jnp.float32)
        masks = mask * s
        wm4 = wm - 4.0
        one = jnp.asarray(1, jnp.int32)

        def step(x):
            up = pltpu.roll(x, shift=one, axis=0)
            dn = pltpu.roll(x, shift=jnp.asarray(shape[0] - 1, jnp.int32), axis=0)
            left = pltpu.roll(x, shift=one, axis=1)
            right = pltpu.roll(x, shift=jnp.asarray(shape[1] - 1, jnp.int32), axis=1)
            return masks * (((up + dn) + (left + right)) + wm4 * x)

        return step

    def noroll_build(wm, shape):
        """Same arithmetic, rolls replaced by cheap rescales — isolates roll cost."""
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = ((rows < N) & (cols >= 1) & (cols <= N)).astype(jnp.float32)
        masks = mask * s
        wm4 = wm - 4.0

        def step(x):
            up = x * 1.0001
            dn = x * 0.9999
            left = x * 1.0002
            right = x * 0.9998
            return masks * (((up + dn) + (left + right)) + wm4 * x)

        return step

    def min_build(wm, shape):
        """Minimal op count: masks·nb + wm4s·x with wm4s pre-masked+scaled.

        4 rolls + 3 adds + 1 mul + 1 fma per step; BC+scale folded into the
        two precomputed coefficient arrays.
        """
        rows = lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = ((rows < N) & (cols >= 1) & (cols <= N)).astype(jnp.float32)
        masks = mask * s
        wm4s = masks * (wm - 4.0)
        one = jnp.asarray(1, jnp.int32)

        def step(x):
            up = pltpu.roll(x, shift=one, axis=0)
            dn = pltpu.roll(x, shift=jnp.asarray(shape[0] - 1, jnp.int32), axis=0)
            left = pltpu.roll(x, shift=one, axis=1)
            right = pltpu.roll(x, shift=jnp.asarray(shape[1] - 1, jnp.int32), axis=1)
            return masks * ((up + dn) + (left + right)) + wm4s * x

        return step

    t_min = time_variant("stencil minimal pingpong", min_build, v, w, pingpong=True)
    t_cur = time_variant("stencil r1 formulation", cur_build, v, w)
    t_opt = time_variant("stencil hoisted+fused", opt_build, v, w)
    t_optpp = time_variant("stencil hoisted pingpong", opt_build, v, w, pingpong=True)
    time_variant("stencil hoisted pingpong u2", opt_build, v, w, pingpong=True,
                 unroll=2)
    time_variant("stencil hoisted pingpong u4", opt_build, v, w, pingpong=True,
                 unroll=4)
    t_nr = time_variant("stencil rolls->muls pingpong", noroll_build, v, w,
                        pingpong=True)
    t_curpp = time_variant("stencil r1 pingpong", cur_build, v, w, pingpong=True)
    t_subs = time_variant("roll sublane x1 pingpong", roll_chain(0, 1), v, w,
                          pingpong=True)
    t_lanes = time_variant("roll lane x1 pingpong", roll_chain(1, 1), v, w,
                           pingpong=True)

    print("\n--- cost model ---")
    print(f"per-mul: {(t_mul8 - t_mul4) / 4:.3f} us (marginal x4->x8); "
          f"fixed/step ~ {t_mul2 - 2 * (t_mul8 - t_mul4) / 4:.3f} us")
    print(f"sublane roll: {(t_sub4 - t_sub1) / 3:.3f} us; "
          f"lane roll: {(t_lane4 - t_lane1) / 3:.3f} us")
    print(f"roll overhead in stencil (pingpong): {t_optpp - t_nr:.3f} us")
    print(f"pingpong 1-roll: sublane {t_subs:.3f} lane {t_lanes:.3f}")
    print(f"r1 {t_cur:.3f} -> hoisted {t_opt:.3f} -> pingpong {t_optpp:.3f} "
          f"(r1+pingpong {t_curpp:.3f})")


if __name__ == "__main__":
    main()
