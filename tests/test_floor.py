"""Floor-aware df32 acceptance (VERDICT r4 next #1 and #8).

The paired-f32 state resolves u only to ε_dd·|u|, so a df32 solve's ‖F‖
plateaus at the image of that granularity under the Jacobian — measured on
real v5e at 1.148e-12 / 2.282e-12 / 4.638e-12 / 9.130e-12 for the 512²–4096²
Bratu flagship (∝ n; benchmarks/floor_probe.py).  A tolerance at/below the
plateau used to burn max_niter stall outers with a coin-flip ``solved``
(docs/design.md "The df32 floor").  These tests pin the library answer:
:func:`newtonkrylov_tpu.df32.floor_estimate` (one jvp probe, calibrated
~1.6× above the plateau) and the drivers' ``floor_rtol`` tolerance clamp
with its ``info.floor_limited`` report.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import df32 as dd
from newtonkrylov_tpu import newton_krylov, newton_krylov_jit
from newtonkrylov_tpu.continuation import pseudo_transient
from newtonkrylov_tpu.problems import bratu2d


def _probe(n):
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float32)
    return float(jax.jit(
        lambda u: dd.floor_estimate(bratu2d.residual_scaled, u, p)
    )(u0))


def test_floor_estimate_scaling_law():
    """floor ∝ n for the 2-D stencil family: the ε_dd·‖u‖-granularity law.

    ‖u‖₂ of a fixed-amplitude field grows ∝ n (n² entries), and the probe is
    linear in the granularity δ = ε_dd·|u| — so quadrupling the side must
    ~quadruple the estimate.  This is the scaling pin behind the design.md
    prediction of where a given tol_rel stops being reachable single-chip
    (measured plateaus double per size doubling, 512²→4096²).
    """
    f32, f128 = _probe(32), _probe(128)
    assert f32 > 0 and f128 > 0
    ratio = f128 / f32
    assert 2.5 < ratio < 6.5  # ∝ n ⇒ 4, with sign-pattern statistics slack


def test_floor_estimate_zero_state_is_zero():
    p = bratu2d.default_config(32, lam=5.0)
    u0 = jnp.zeros((32, 32), jnp.float32)
    assert _probe(32) > 0
    assert float(dd.floor_estimate(bratu2d.residual_scaled, u0, p)) == 0.0


def _solve(n, tol_abs, floor_rtol, u0=None, max_niter=12):
    p = bratu2d.default_config(n, lam=5.0)
    if u0 is None:
        u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    return newton_krylov_jit(
        bratu2d.residual_scaled, u0, p,
        algo="cg", tol_rel=0.0, tol_abs=tol_abs,
        krylov_dtype=jnp.float32,
        residual_df=bratu2d.residual_scaled_df,
        max_niter=max_niter, floor_rtol=floor_rtol,
    )


def test_sub_floor_tolerance_is_deterministic_with_clamp():
    """A request BELOW the representable floor converges deterministically:
    the clamp engages (floor_limited=True), the solve stops as soon as the
    floor-clamped tolerance is met instead of stalling to max_niter, and
    repeats from perturbed starts agree.  Without the clamp the same request
    burns every outer and reports failure."""
    n = 48
    # way below any df32 floor at this size (plateau ~1e-13): unreachable
    tol_abs = 1.0e-16

    u1, i1 = _solve(n, tol_abs, floor_rtol=2.0)
    assert bool(i1.floor_limited)
    assert bool(i1.solved)
    outers = int(i1.stats.outer_iterations)
    assert outers < 12  # no stall-to-max_niter burn

    # determinism across last-bit start perturbations
    u0b = bratu2d.initial_guess(n, dtype=jnp.float64) * (1.0 + 1e-9)
    u2, i2 = _solve(n, tol_abs, floor_rtol=2.0, u0=u0b)
    assert bool(i2.solved) and bool(i2.floor_limited)
    assert abs(int(i2.stats.outer_iterations) - outers) <= 1

    # the unclamped driver documents the old coin-flip regime: all outers
    # burned, tolerance unmet
    u3, i3 = _solve(n, tol_abs, floor_rtol=None)
    assert not bool(i3.floor_limited)
    assert int(i3.stats.outer_iterations) == 13  # max_niter+1 (inclusive bound)
    assert not bool(i3.solved)

    # the clamped answer is still a true solution to the floor's accuracy
    r64 = bratu2d.residual_scaled(u1, bratu2d.default_config(n, lam=5.0))
    assert float(jnp.linalg.norm(r64)) < 1e-11


def test_reachable_tolerance_untouched_by_clamp():
    """At tolerances above the floor the guard must be a no-op: identical
    history and floor_limited=False — reference-exact semantics preserved."""
    n = 48
    ua, ia = _solve(n, 1.0e-8, floor_rtol=2.0)
    ub, ib = _solve(n, 1.0e-8, floor_rtol=None)
    assert bool(ia.solved) and bool(ib.solved)
    assert not bool(ia.floor_limited)
    ha, hb = np.asarray(ia.history), np.asarray(ib.history)
    np.testing.assert_array_equal(ha[np.isfinite(ha)], hb[np.isfinite(hb)])


def test_host_driver_floor_clamp():
    n = 48
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u, info = newton_krylov(
        bratu2d.residual_scaled, u0, p,
        algo="cg", tol_rel=0.0, tol_abs=1.0e-16,
        residual_df=bratu2d.residual_scaled_df, max_niter=12,
    )
    assert info.floor_limited is True
    assert bool(info.solved)
    assert int(info.stats.outer_iterations) < 12


def test_ptc_floor_clamp():
    # u0 at solution amplitude: the probe measures granularity AT the probed
    # state, so a start 10× below the solution's scale under-estimates the
    # floor ~10× (documented in floor_estimate; measured here: plateau
    # 8e-14 vs a 1.2e-14 probe from a 0.1-scaled start)
    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)
    u, info = pseudo_transient(
        lambda u, pp: -bratu2d.residual_scaled(u, pp), u0, p,
        delta0=float((n + 1) ** 2), tol_rel=0.0, tol_abs=1.0e-16,
        max_steps=40, krylov_dtype=jnp.float32,
        residual_df=lambda ud, pp: dd.neg(bratu2d.residual_scaled_df(ud, pp)),
    )
    assert bool(info.floor_limited)
    assert bool(info.solved)
    assert int(info.stats.outer_iterations) < 40


def test_floor_calibration_transfers_to_nonsymmetric_family():
    """Cross-family pin of the probe calibration (docstring table): on
    convection-dominated convdiff (c=25, MG-general recipe) the probe at
    the solution state sits within [0.8, 2.5]x of the driven-past-any-
    tolerance plateau -- i.e. inside the floor_rtol=2 clamp's safety band.
    Measured 1.02-1.04x on the real chip; the df32 arithmetic is
    backend-portable so the CPU plateau pins the same fact."""
    from newtonkrylov_tpu.mg import multigrid2d_general
    from newtonkrylov_tpu.newton import _cast_floating
    from newtonkrylov_tpu.problems import convdiff2d

    n = 96
    p = convdiff2d.default_config(n, c=25.0, dtype=jnp.float64)
    u0 = convdiff2d.initial_guess(n, jnp.float64)
    u, info = newton_krylov_jit(
        convdiff2d.residual_scaled, u0, p,
        algo="gmres", tol_rel=0.0, tol_abs=1e-30,
        krylov_dtype=jnp.float32,
        residual_df=convdiff2d.residual_scaled_df, floor_rtol=None,
        M=multigrid2d_general(), forcing=None, max_niter=12,
        krylov_kwargs={"restart": 80, "itmax": 400})
    h = np.asarray(info.history)
    plateau = float(np.nanmin(h))
    us = convdiff2d.manufactured_solution(n, jnp.float64).astype(jnp.float32)
    probe = float(dd.floor_estimate(
        convdiff2d.residual_scaled, us, _cast_floating(p, jnp.float32)))
    assert plateau > 0 and probe > 0
    ratio = probe / plateau
    assert 0.8 < ratio < 2.5, (plateau, probe, ratio)


def test_floor_probe_sees_single_axis_couplings():
    """Review regression: a single sign orientation degenerates on 2-D
    leaves ((-1)^flat is constant along axis 0 for even widths), so an
    operator coupling ONLY along axis 0 saw a smooth tangent and a ~zero
    probe.  The two-orientation probe must respond."""
    n = 32

    def F_axis0(u, p):
        up = jnp.pad(u, ((1, 1), (0, 0)))
        return up[2:, :] + up[:-2, :] - 2.0 * u   # d_xx only

    u = jnp.ones((n, n), jnp.float32) * 0.5
    fl = float(dd.floor_estimate(F_axis0, u, None))
    # the oscillatory-axis response: |J delta| ~ 4*eps_dd*|u| per entry
    per_entry = 4.0 * 0.5 * 2.0 ** -47
    expect = per_entry * n / 4.0  # norm over n^2 entries / calibration
    assert fl > 0.25 * expect, (fl, expect)

    # and the isotropic calibration values are unchanged by the max():
    # both orientations respond identically on the symmetric stencil
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float32)
    assert _probe(n) > 0
