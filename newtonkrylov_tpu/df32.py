"""Double-float ("df32") arithmetic: ~f64 accuracy from paired f32 on the VPU.

TPU has no f64 datapath; XLA emulates it, and the emulation measures 15-20×
the f32 cost standalone and far worse inside ``lax.while_loop`` bodies
(benchmarks/solve_bisect.py, benchmarks/while_anatomy.py).  The refined
Newton driver needs high precision in exactly one place — the *acceptance*
residual and its norm (docs/design.md "Precision strategy") — so this module
provides classic double-word arithmetic (Dekker 1971; Hida/Li/Bailey QD;
CUDA's df64 idiom) built from f32 VPU ops: error-free transforms
(``two_sum``, ``two_prod`` via Dekker splitting — TPU/XLA exposes no fma),
double-word add/mul, and an accurate ``exp``.

A df32 value is a pair ``(hi, lo)`` of same-shape f32 arrays with
``hi = fl(hi+lo)`` (normalized); it represents ``hi + lo`` with ~49
effective mantissa bits (unit roundoff ~2⁻⁴⁸ ≈ 3.6e-15 for products/sums,
slightly larger through ``exp``).  That is enough to drive ‖F‖ to the
1e-8·‖F₀‖ target of BASELINE.md without any f64 tensor op inside the hot
loop: the residual's *cancellation* (the stencil's neighbors−4u at O(Δx²))
happens error-free in the two-sum chains, after which the f32 norm of
``hi`` is exact to f32 roundoff — which is all a convergence test needs.

Used by :func:`newtonkrylov_tpu.problems.bratu2d.residual_scaled_df` and the
``newton_krylov_jit(..., residual_df=...)`` refined path.  The reference has
no analogue (Julia has hardware f64); this is the TPU-native answer to the
same requirement, cf. the complex-step JFNK reference the upstream docs cite
(docs/src/refs.bib: Kan2022) solving the same "residual accuracy floors the
Newton tolerance" problem.

.. warning:: **Backend requirement: strict IEEE f32 arithmetic.**  XLA:CPU's
   default fast-math applies the non-IEEE rewrite ``x·y₁ + x·y₂ →
   x·(y₁+y₂)``, which silently voids the two_sum invariant (the c·lo word of
   a constant is folded away; an ``optimization_barrier`` does NOT survive —
   the barrier expander runs before the late simplifier passes).  On CPU set
   ``XLA_FLAGS=--xla_cpu_enable_fast_math=false`` (tests/conftest.py does).
   The TPU compiler is bit-exact for these patterns (verified on v5e).
   :func:`selfcheck` detects a value-breaking backend at runtime.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "DF", "two_sum", "fast_two_sum", "two_prod",
    "df_from_f64", "df_to_f64", "df_from_f32", "tree_add_f32",
    "add", "add_f32", "sub", "neg", "mul", "mul_f32", "exp", "norm_hi",
    "df_map", "shift", "neighbor_sum", "scale_pow2", "scale_const",
    "scaled_exp", "df_matvec", "selfcheck", "floor_estimate",
]


class DF(NamedTuple):
    """A double-float array: represents ``hi + lo``, normalized."""

    hi: jax.Array
    lo: jax.Array


def two_sum(a, b):
    """Error-free transform: a+b = s+e exactly (Knuth, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a+b = s+e, REQUIRES |a| >= |b| (Dekker, 3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLIT = 4097.0  # 2^12 + 1 for f32 (24-bit mantissa -> 12/12 split)


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a·b = p+e exactly (Dekker splitting; no fma on TPU/XLA)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def df_from_f64(x) -> DF:
    """Split an f64 array (or pytree) into a normalized df32 pair.

    Boundary op only — also accepts f32 input (lo = 0).  ``DF(hi, lo)``
    holds two parallel pytrees, so a DF of a tree state is itself a pytree.
    """
    hi = jax.tree.map(lambda l: l.astype(jnp.float32), x)
    lo = jax.tree.map(
        lambda l, h: (l - h.astype(l.dtype)).astype(jnp.float32), x, hi
    )
    return DF(hi, lo)


def df_to_f64(x: DF):
    return jax.tree.map(
        lambda h, l: h.astype(jnp.float64) + l.astype(jnp.float64), x.hi, x.lo
    )


def df_from_f32(x) -> DF:
    return DF(x, jax.tree.map(jnp.zeros_like, x))


def tree_add_f32(u: DF, t) -> DF:
    """u + t over parallel pytrees, t a plain-f32 tree (exact two-sum update).

    The refined Newton step ``u ← u − d`` with a df32-carried state: each
    leaf runs two_sum(hi, t) then folds lo and renormalizes (~10 flops).
    """
    def leaf(h, l, b):
        s, e = two_sum(h, b)
        e = e + l
        return DF(*fast_two_sum(s, e))

    pairs = jax.tree.map(leaf, u.hi, u.lo, t)
    is_df = lambda x: isinstance(x, DF)  # noqa: E731
    return DF(
        jax.tree.map(lambda p: p.hi, pairs, is_leaf=is_df),
        jax.tree.map(lambda p: p.lo, pairs, is_leaf=is_df),
    )


def add(a: DF, b: DF) -> DF:
    """Double-word + double-word (accurate variant, ~20 flops)."""
    s, e = two_sum(a.hi, b.hi)
    t, f = two_sum(a.lo, b.lo)
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    return DF(*fast_two_sum(s, e))


def add_f32(a: DF, b) -> DF:
    """Double-word + single f32 (~10 flops)."""
    s, e = two_sum(a.hi, b)
    e = e + a.lo
    return DF(*fast_two_sum(s, e))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    """Double-word × double-word (~25 flops)."""
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    return DF(*fast_two_sum(p, e))


def mul_f32(a: DF, b) -> DF:
    """Double-word × single f32."""
    p, e = two_prod(a.hi, b)
    e = e + a.lo * b
    return DF(*fast_two_sum(p, e))


# -- exp ----------------------------------------------------------------------
# Range reduction x = k·ln2 + r, |r| ≤ ln2/2, with ln2 split so k·LN2_HI is
# exact for |k| < 2^11; e^r by a degree-12 Taylor evaluated in df32 (term_13 =
# r^13/13! ≤ 1.6e-13 at |r| = ln2/2, below the df32 target); scale by 2^k via
# exponent-field bitcast.  Matches f64 exp to ~1e-12 relative while the
# RESULT's lo word stays in the f32 normal range (|x| ≲ ~60; for strongly
# negative x the accuracy floors gracefully toward plain-f32 as e^x·2⁻²⁵
# goes subnormal/flushes — tests/test_df32.py pins both regimes).

_LN2_HI = np.float32(0.693145751953125)        # 21 bits, exact ·k for k<2^11
_LN2_LO = np.float32(1.4286068203094172e-06)
_INV_LN2 = np.float32(1.4426950408889634)

# 1/n! for n = 2..12, each as a df32 (hi, lo) pair — a plain-f32 coefficient
# for 1/3! alone injects ~4e-10 relative error into e^r
import math as _math

_FACT_INV = []
for _n in range(2, 13):
    _c = 1.0 / _math.factorial(_n)
    _chi = np.float32(_c)
    _FACT_INV.append((_chi, np.float32(_c - float(_chi))))
del _n, _c, _chi


def _ldexp(x, k):
    """x · 2^k for integer array k (|k| bounded by the f32 exponent range)."""
    bits = ((k + 127) << 23).astype(jnp.int32)
    return x * lax.bitcast_convert_type(bits, jnp.float32)


def exp(a: DF) -> DF:
    """Double-word e^a (elementwise)."""
    x = a.hi + a.lo
    k = jnp.round(x * _INV_LN2)
    ki = k.astype(jnp.int32)
    # r = a - k·ln2, exactly in df32 (k·LN2_HI exact; LN2_LO correction dd)
    r = add(a, DF(-k * _LN2_HI, -k * _LN2_LO))

    # e^r = 1 + r·(1 + r·P(r)), P(r) = 1/2! + r/3! + … + r¹⁰/12!  (Horner,
    # df32 throughout, df32 coefficients)
    chi, clo = _FACT_INV[-1]
    acc = DF(jnp.full_like(r.hi, chi), jnp.full_like(r.hi, clo))
    for chi, clo in reversed(_FACT_INV[:-1]):
        acc = add(mul(acc, r), DF(jnp.full_like(r.hi, chi),
                                  jnp.full_like(r.hi, clo)))
    acc = add_f32(mul(acc, r), np.float32(1.0))    # 1 + r·P
    acc = mul(acc, r)                               # r + r²·P
    acc = add_f32(acc, np.float32(1.0))             # 1 + r + r²·P

    # clamp k to the safe exponent window (|a| ≤ ~80 in any sane residual)
    ki = jnp.clip(ki, -126, 126)
    return DF(_ldexp(acc.hi, ki), _ldexp(acc.lo, ki))


# -- stencil combinators --------------------------------------------------------
# The building blocks for writing a problem's residual in df32 without
# hand-deriving every error-free transform (VERDICT r2 weak #4): structural
# ops apply to both words, shifts/sums run the two-sum chains, and constants
# enter either exactly (powers of two), as df32-split factors, or through an
# exponent shift (scaled_exp).  residual_scaled_df for bratu1d/bratu2d and
# heat2d's rhs_df are assembled purely from these; each is pinned against the
# f64 oracle in tests/test_df32_problems.py.


def df_map(fn, a: DF) -> DF:
    """Apply a *structurally exact* array op (pad, slice, reshape, concat,
    transpose, negation) to both words.  The op must be exact on each f32
    word individually — any op that rounds (general scaling, sums of
    elements) breaks the normalized-pair invariant; use the dd arithmetic
    for those."""
    return DF(fn(a.hi), fn(a.lo))


def shift(up: DF, *offsets: int) -> DF:
    """Interior view of a ghost-padded block, shifted by ``offsets``.

    ``up`` has one ghost cell per side on every axis (shape ``n_i + 2``);
    ``shift(up, 1, 0)`` is the (n₀, n₁) slice displaced one cell along axis
    0 — the df32 analogue of ``up[2:, 1:-1]`` in a padded-stencil residual.
    Pure slicing: exact on both words.
    """
    def sl(w):
        ix = tuple(
            slice(1 + o, w.shape[ax] - 1 + o) for ax, o in enumerate(offsets)
        )
        return w[ix]

    return df_map(sl, up)


def neighbor_sum(up: DF, offsets) -> DF:
    """Σ of unit-coefficient shifts of a padded block, in exact two-sum
    chains — the ``padded-shift add chain`` at the heart of every stencil
    residual.  ``offsets``: iterable of per-axis shift tuples, e.g. the 1-D
    three-point neighbors ``[(-1,), (1,)]`` or the 2-D five-point
    ``[(1, 0), (-1, 0), (0, 1), (0, -1)]``."""
    terms = [shift(up, *off) for off in offsets]
    s = terms[0]
    for t in terms[1:]:
        s = add(s, t)
    return s


def scale_pow2(a: DF, c) -> DF:
    """c·a for a power-of-two constant (±1, ±2, ±4, 0.5, …) — exact in f32,
    so both words scale with a plain multiply (the −4u term of a 5-point
    stencil costs 2 flops, not a two_prod)."""
    f = float(c)
    m, e = np.frexp(f)
    assert m in (0.5, -0.5) or f == 0.0, f"{c} is not a power of two"
    return DF(c * a.hi, c * a.lo)


def scale_const(a: DF, c: float) -> DF:
    """c·a for a general host constant: c is split into an (hi, lo) f32 pair
    and the product runs a double-word multiply, returned WITHOUT the final
    renormalizing ``fast_two_sum``.  With a compile-time-constant multiplier
    XLA:CPU's late LLVM pipeline reassociates that last 3-flop pattern to
    ``(p+e, 0)`` — discarding the lo word — even with
    ``--xla_cpu_enable_fast_math=false`` (measured: jit error jumps 1e-14 →
    5e-8 on heat2d's a/Δx² constants; benchmarks/dst_precision_probe.py
    session notes).  An un-normalized pair is a valid DF input to every
    consumer here (``add``/``sub`` start with exact Knuth ``two_sum``, which
    needs no magnitude ordering), so the renormalization is pure loss.
    Accurate to ~2⁻⁴⁸ on strict-IEEE backends (TPU; CPU w/ fast-math off)."""
    chi = np.float32(c)
    clo = np.float32(float(c) - float(chi))
    p, e = two_prod(a.hi, chi)
    e = e + (a.hi * clo + a.lo * chi)
    return DF(p, e)


def scaled_exp(a: DF, c: float) -> DF:
    """c·eᵃ for a host constant c ≠ 0, computed as ±e^(a + ln|c|).

    The constant enters through an EXACT df32 add in the exponent instead of
    two products sharing the factor eᵃ — no ``x·c_hi + x·c_lo`` pattern for
    a fast-math simplifier to fold (see the module warning; this is how
    bratu2d's Δx²λeᵘ term has always been assembled)."""
    import math as m

    cf = float(c)
    assert cf != 0.0, "scaled_exp needs a nonzero constant"
    lnc = m.log(abs(cf))
    lnc_hi = np.float32(lnc)
    lnc_lo = np.float32(lnc - float(lnc_hi))
    out = exp(add(a, DF(jnp.full_like(a.hi, lnc_hi),
                        jnp.full_like(a.hi, lnc_lo))))
    return out if cf > 0 else neg(out)


def _comp_sum_last(P, E):
    """Compensated tree sum of ``P`` along the last axis: two_sum at every
    reduction level keeps the running sum error-free; the generated error
    terms fold into ``E`` with plain adds (each is ≤ εΣ|P|, so the naive
    error-sum's own rounding is O(ε²Σ|P|) — below the double-word target).
    Returns ``(s, e)`` with Σ = s + e to ~2⁻⁴⁶."""
    n = P.shape[-1]
    n2 = 1 << max(n - 1, 1).bit_length()
    if n2 != n:
        pad = [(0, 0)] * (P.ndim - 1) + [(0, n2 - n)]
        P = jnp.pad(P, pad)
        E = jnp.pad(E, pad)
    while P.shape[-1] > 1:
        m = P.shape[-1] // 2
        s, e = two_sum(P[..., :m], P[..., m:])
        E = E[..., :m] + E[..., m:] + e
        P = s
    return P[..., 0], E[..., 0]


def df_matvec(A: DF, x: DF) -> DF:
    """y = A @ x in double-float — the double-word matvec for dense-operator
    residuals (the SBP ``D1m @ (D1p @ u)`` composition of heat1d_dg;
    VERDICT r3 next #7).

    ``A`` is a DF split of the (possibly f64-built) matrix
    (:func:`df_from_f64`), shape (n, m); ``x`` a DF vector of length m.
    Hi×hi products are exact (:func:`two_prod`) and tree-summed with
    compensation (:func:`_comp_sum_last`); the hi×lo / lo×hi cross terms —
    already ~ε relative to the main term — run as plain f32 contractions at
    HIGHEST precision (their rounding is O(ε²) of the result).  Cost:
    O(n·m) VPU ops — for the ~160² SBP operators this is elementwise-bound,
    not MXU-bound, and keeps the whole march free of emulated f64.
    """
    import jax as _jax

    P, E = two_prod(A.hi, x.hi[None, :])
    s, e = _comp_sum_last(P, E)
    hi = _jax.lax.Precision.HIGHEST
    small = e + (jnp.dot(A.hi, x.lo, precision=hi)
                 + jnp.dot(A.lo, x.hi, precision=hi))
    return DF(*fast_two_sum(s, small))


def selfcheck() -> bool:
    """True iff the backend preserves the error-free transforms under jit.

    Runs the known-dangerous pattern (two products sharing a factor, summed
    by two_sum) through ``jax.jit`` and compares against a strict host-side
    IEEE evaluation.  Returns False on a backend whose simplifier folds the
    low word away (e.g. XLA:CPU with its default fast-math — see the module
    warning); call this before trusting a ``residual_df`` solve on a new
    platform.
    """
    c1 = np.float32(0.00118305636)
    c2 = np.float32(0.00118305636 - float(c1))
    xn = np.linspace(1.0, 4.0, 64, dtype=np.float32)

    def f(x):
        s, e = two_sum(x * c1, x * c2)
        return s, e

    s_j, e_j = jax.jit(f)(jnp.asarray(xn))
    # The criterion is VALUE preservation: s+e ≈ fl(x·c1)+fl(x·c2) in f64.
    # A strict-IEEE backend may restructure the pair (error ≤ ulp₃₂ of the
    # tiny e word, ~1e-17 here); the fast-math factor-and-fold rewrite loses
    # ALL of the c2 product (~1e-10 here) — 7 decades apart, so threshold at
    # 1% of the c2 contribution.
    a = (xn * c1).astype(np.float32).astype(np.float64)
    b = (xn * c2).astype(np.float32).astype(np.float64)
    got = np.asarray(s_j).astype(np.float64) + np.asarray(e_j).astype(np.float64)
    return bool(np.max(np.abs(got - (a + b))) < 0.01 * np.max(np.abs(b)))


# Measured on the 2-D Bratu flagship (real v5e, benchmarks/floor_probe.py):
# the random-sign granularity response ‖J·(±ε_dd|u|)‖ sits at a stable
# 6.28–6.38× the solve's true ‖F‖ plateau across 512²–4096² (an 8× size
# span); dividing by 4 places the estimate at ~1.6× the plateau — above the
# plateau's ±2% run-to-run jitter, below any practical target.
_RND_PROBE_CALIBRATION = 4.0


def floor_estimate(F, u_hi, p=None, space=None):
    """Measured acceptance floor of a df32-carried solve at state ``u_hi``.

    The smallest ‖F‖ a df32-carried Newton iteration can reliably reach is
    set by the *state-representation granularity*: the pair ``(hi, lo)``
    resolves ``u`` to one ulp of the lo word, ε_dd·|u| ≈ 2⁻⁴⁷·|u|, and the
    solve's computed residual carries arithmetic noise at the image of that
    granularity under the Jacobian.  Measured as forward-mode tangents
    of the *plain* residual at deterministic alternating-sign
    perturbations (one per axis orientation, larger response kept):

        floor ≈ ‖J(u) · (±ε_dd·|u|)‖ / 4      (two ``jax.jvp`` calls)

    Design notes, all measured (benchmarks/floor_probe.py, real v5e):

    * NOT by differencing two df32 residual evaluations — inside the
      whole-solve program the two evals fuse differently and their hi
      words jitter at the f32 ulp of ‖F‖ (measured 3.2e-7 vs the true
      1.9e-12 on the heat2d step residual).  The tangent is computed at
      uniform tiny scale with ε₃₂ *relative* accuracy.
    * Alternating signs (``(−1)^flat_index``), NOT a coherent +ε_dd·|u|
      tangent: the coherent mode is smooth, the stencil cancels it to
      ~ε_dd·Δx²-level and its squared norm underflows f32 (measured
      exactly 0.0 at ≥1024²).  The oscillatory mode models the incoherent
      per-entry rounding the df32 arithmetic actually commits — without
      cancellation and without the checkerboard mode's 2× over-excitation
      (checkerboard measured 12.8× the plateau; this pattern 6.3×).
    * Calibration: the probe/plateau ratio measured 6.28–6.38× across
      512²–4096² flagship solves driven 15 outers past any tolerance
      (plateaus 1.148e-12 / 2.282e-12 / 4.638e-12 / 9.130e-12 ∝ n — the
      ε_dd·‖u‖ granularity law, docs/design.md "The df32 floor");
      ``/_RND_PROBE_CALIBRATION`` places the estimate at ~1.6× the
      plateau.  Cross-family check (nonsymmetric convection–diffusion,
      c=25, MG-general recipe, same protocol): probe-at-solution /
      plateau = 1.02–1.04 at n = 128/256 — the calibration transfers.
      For near-identity step residuals (implicit time steps) the floor is
      orders below any stepping tolerance and the clamp is a no-op.

    A zero state has zero granularity everywhere — the probe returns 0 and
    the driver clamp degrades to a no-op; estimate at a scaled state (or
    widen ``tol_abs``) for all-zero starts.

    Parameters: ``F`` — the plain residual ``F(u, p)`` in the Krylov dtype
    (the drivers pass their inner-loop residual with params already cast);
    ``u_hi`` — the state's hi-word tree (Krylov dtype); ``space`` —
    reduction space for the norm (psum point under sharding), default ℓ².
    The probe runs TWO tangents — signs alternating along the leaf's LAST
    axis and along its FIRST axis — and takes the larger response.  One
    orientation alone degenerates for multi-dim leaves: ``(−1)^flat`` on
    an even-width 2-D leaf is constant along axis 0, so an operator
    coupling only along axis 0 would see a smooth tangent and cancel to
    an underestimated (even zero) floor (caught by review; pinned in
    tests/test_floor.py).  For isotropic stencils both orientations
    respond identically, so the published calibration is unchanged; for
    1-D leaves the two coincide.  Under shard_map the local pattern
    differs from the single-device one, which moves the estimate only
    statistically (the norm concentrates).
    """
    def sign_leaf(h, last: bool):
        shape = h.shape if h.ndim else (1,)
        axis = len(shape) - 1 if last else 0
        i = lax.broadcasted_iota(jnp.int32, shape, axis)
        s = jnp.where(i % 2 == 0, 1.0, -1.0).astype(h.dtype)
        return s.reshape(h.shape)

    def response(last: bool):
        delta = jax.tree.map(
            lambda h: jnp.abs(h) * jnp.asarray(2.0 ** -47, h.dtype)
            * sign_leaf(h, last),
            u_hi,
        )
        _, jd = jax.jvp(lambda uu: F(uu, p), (u_hi,), (delta,))
        if space is None:
            from .tree import tree_norm

            return tree_norm(jd)
        return space.norm(jd)

    nrm = jnp.maximum(response(True), response(False))
    return nrm / _RND_PROBE_CALIBRATION


def norm_hi(r: DF):
    """f32 2-norm of a df32 residual.

    Once the residual VALUE is accurate (its cancellation resolved in the
    two-sum chains), the norm needs only f32 relative accuracy — ``hi`` is
    fl(r) so ‖hi‖ matches ‖r‖ to f32 roundoff.
    """
    return jnp.linalg.norm(r.hi)
