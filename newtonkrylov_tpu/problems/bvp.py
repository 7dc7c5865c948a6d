"""Kelley2022 two-point boundary-value problem (examples/bvp.jl).

Staggered state ``U`` of length 2n interleaving (v, v′) on t ∈ [0, 20],
n = 801 by default (examples/bvp.jl:40): trapezoidal collocation of
``v″ = φ(t, v, v′) = 4 t† v′ + (t v − 1) v`` with boundary conditions
``v′(0) = 0`` and ``v(20) = 0`` (the first/last residual rows,
examples/bvp.jl:17-19).  Reference solver recipe: FGMRES with a nested
GMRES(itmax=30) right preconditioner (examples/bvp.jl:54-58).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Params", "default_config", "residual", "residual_df",
           "initial_guess", "N_DEFAULT"]

N_DEFAULT = 801
T_MAX = 20.0


class Params(NamedTuple):
    tv: jnp.ndarray       # collocation times, shape (n,)
    tvdag: jnp.ndarray    # t† = 1/t with t†(0) = 0 (examples/bvp.jl:46-48)
    h: float              # mesh width
    n: int


def default_config(n: int = N_DEFAULT, dtype=None) -> Params:
    h = T_MAX / (n - 1)
    tv = jnp.arange(n, dtype=dtype) * h
    tvdag = jnp.concatenate([jnp.zeros(1, tv.dtype), 1.0 / tv[1:]])
    return Params(tv=tv, tvdag=tvdag, h=h, n=n)


def phi(t, tdag, vp, v):
    """φ(t, v, v′) (examples/bvp.jl:5-8)."""
    return 4.0 * tdag * vp + (t * v - 1.0) * v


def initial_guess(p: Params):
    """v₀ = e^{−0.1t²}, v′₀ = −0.2 t v₀, interleaved (examples/bvp.jl:25-28)."""
    v = jnp.exp(-0.1 * p.tv * p.tv)
    vp = -0.2 * v * p.tv
    U = jnp.zeros(2 * p.n, dtype=v.dtype)
    return U.at[0::2].set(v).at[1::2].set(vp)


def residual(U, p: Params):
    """Trapezoidal collocation residual (examples/bvp.jl:11-23), vectorized.

    Row layout matches the reference exactly (0-based):
      res[0]      = v′₀              (BC: v′(0) = 0)
      res[2n−1]   = v_{n−1}          (BC: v(20) = 0)
      res[2i]     = v_i − v_{i−1} − h/2 (v′_{i−1} + v′_i),        i = 1…n−1
      res[2i−1]   = v′_i − v′_{i−1} + h/2 (φ_{i−1} + φ_i),        i = 1…n−1
    """
    v = U[0::2]
    vp = U[1::2]
    force = phi(p.tv, p.tvdag, vp, v)
    h2 = 0.5 * p.h

    dv = v[1:] - v[:-1] - h2 * (vp[:-1] + vp[1:])          # rows 2i,   i=1..n-1
    dvp = vp[1:] - vp[:-1] + h2 * (force[:-1] + force[1:])  # rows 2i-1, i=1..n-1

    res = jnp.zeros_like(U)
    res = res.at[0].set(vp[0])
    res = res.at[2 * p.n - 1].set(v[p.n - 1])
    res = res.at[2:-1:2].set(dv)    # even rows 2..2n-2
    res = res.at[1:-1:2].set(dvp)   # odd rows 1..2n-3
    return res


def residual_df(U, p: Params):
    """Trapezoidal collocation residual in df32 double-float arithmetic
    (``U`` a DF pair; VERDICT r3 next #7 — the staggered-stencil corner of
    the df32 problem matrix).

    Every arithmetic step mirrors :func:`residual` in double-word form:
    the collocation times enter as f64-split DF constants, φ runs
    double-word multiplies, the trapezoidal differences resolve in exact
    two-sum chains, and the final row interleave is pure placement (exact
    per word).  The acceptance residual of a 1e-8-refined BVP solve on TPU
    — no emulated-f64 op anywhere.
    """
    from .. import df32 as dd

    v = dd.df_map(lambda x: x[0::2], U)
    vp = dd.df_map(lambda x: x[1::2], U)
    t = dd.df_from_f64(p.tv)
    tdag = dd.df_from_f64(p.tvdag)

    # φ = 4·t†·v′ + (t·v − 1)·v
    force = dd.add(
        dd.scale_pow2(dd.mul(tdag, vp), 4.0),
        dd.mul(dd.add_f32(dd.mul(t, v), jnp.float32(-1.0)), v),
    )
    h2 = 0.5 * float(p.h)

    def lo_(a):
        return dd.df_map(lambda x: x[:-1], a)

    def hi_(a):
        return dd.df_map(lambda x: x[1:], a)

    dv = dd.sub(dd.sub(hi_(v), lo_(v)),
                dd.scale_const(dd.add(lo_(vp), hi_(vp)), h2))
    dvp = dd.add(dd.sub(hi_(vp), lo_(vp)),
                 dd.scale_const(dd.add(lo_(force), hi_(force)), h2))

    def asm(vp0, vlast, dvw, dvpw):
        res = jnp.zeros(2 * p.n, dvw.dtype)
        res = res.at[0].set(vp0)
        res = res.at[2 * p.n - 1].set(vlast)
        res = res.at[2:-1:2].set(dvw)
        res = res.at[1:-1:2].set(dvpw)
        return res

    return dd.DF(asm(vp.hi[0], v.hi[p.n - 1], dv.hi, dvp.hi),
                 asm(vp.lo[0], v.lo[p.n - 1], dv.lo, dvp.lo))
