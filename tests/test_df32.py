"""df32 double-float arithmetic vs f64 ground truth (CPU, x64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import df32
from newtonkrylov_tpu.df32 import DF


def _rand64(shape, seed, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float64)


def _rel(a, b):
    return float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1e-300)))


def test_split_roundtrip():
    x = _rand64((64, 64), 0, -100.0, 100.0)
    d = df32.df_from_f64(x)
    assert _rel(df32.df_to_f64(d), x) < 4e-15  # df32 unit roundoff 2⁻⁴⁸
    # normalized: |lo| <= ulp(hi)/2
    assert float(jnp.max(jnp.abs(d.lo))) <= float(
        jnp.max(jnp.spacing(jnp.abs(d.hi)))
    )


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)  # lost entirely in plain f32 addition
    s, e = df32.two_sum(a, b)
    assert float(s) == 1.0
    assert float(e) == pytest.approx(1e-8, rel=1e-6)


def test_eft_survives_jit():
    """XLA factors x·y1 + x·y2 → x·(y1+y2) (not IEEE-safe), which silently
    voids two_sum's invariant under jit; the _guard barrier must stop it.
    Regression: this exact pattern capped the refined solve at an f32-eps
    floor (true residual 4.6e-8 while the internal norm read 1e-11)."""
    c = 0.00118305636
    c1 = jnp.float32(c)
    c2 = jnp.float32(c - float(c1))
    x = _rand64((64,), 8, 1.0, 4.0).astype(jnp.float32)

    def f(x):
        s, e = df32.two_sum(x * c1, x * c2)
        return s.astype(jnp.float64) + e.astype(jnp.float64)

    # two_sum is exact w.r.t. the ROUNDED f32 products (computed eagerly,
    # op-by-op, so no cross-op rewrite can touch them)
    exact = (x * c1).astype(jnp.float64) + (x * c2).astype(jnp.float64)
    for impl in (f, jax.jit(f)):
        # s+e must equal fl(x·c1)+fl(x·c2) exactly — the factored rewrite
        # x·(c1+c2) is off by ~eps·|t| and must not survive
        assert float(jnp.max(jnp.abs(impl(x) - exact))) == 0.0


def test_selfcheck():
    assert df32.selfcheck()


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-10, 10, (256,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-10, 10, (256,)), jnp.float32)
    p, e = df32.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    assert _rel(got, exact) < 1e-14  # error-free for f32 inputs


@pytest.mark.parametrize("op,ref", [
    (df32.add, lambda a, b: a + b),
    (df32.sub, lambda a, b: a - b),
    (df32.mul, lambda a, b: a * b),
])
def test_dd_binary_ops(op, ref):
    x = _rand64((128,), 2, -5.0, 5.0)
    y = _rand64((128,), 3, -5.0, 5.0)
    got = df32.df_to_f64(op(df32.df_from_f64(x), df32.df_from_f64(y)))
    assert _rel(got, ref(x, y)) < 1e-12


def test_add_cancellation():
    """The raison d'être: neighbors−4u cancellation stays accurate."""
    u = _rand64((64,), 4, 0.9, 1.1)
    shift = jnp.roll(u, 1)
    exact = shift - u  # O(0.1) differences of O(1) values
    d = df32.sub(df32.df_from_f64(shift), df32.df_from_f64(u))
    assert _rel(df32.df_to_f64(d), exact) < 1e-12


@pytest.mark.parametrize("lo,hi", [(-1.0, 1.0), (-5.0, 5.0), (-20.0, 20.0)])
def test_exp(lo, hi):
    x = _rand64((512,), 5, lo, hi)
    got = df32.df_to_f64(df32.exp(df32.df_from_f64(x)))
    ref = jnp.exp(x)
    assert _rel(got, ref) < 5e-12


def test_exp_subnormal_floor():
    """For strongly negative x the lo word flushes: accuracy degrades to
    plain-f32 gracefully (documented limitation), never worse."""
    x = _rand64((256,), 7, -80.0, -30.0)
    got = df32.df_to_f64(df32.exp(df32.df_from_f64(x)))
    assert _rel(got, jnp.exp(x)) < 2e-7


def test_exp_jit_and_norm():
    x = _rand64((32, 32), 6)
    f = jax.jit(lambda d: df32.norm_hi(df32.exp(d)))
    got = float(f(df32.df_from_f64(x)))
    assert got == pytest.approx(float(jnp.linalg.norm(jnp.exp(x))), rel=1e-6)


def test_newton_jit_residual_df_path():
    """Refined solve with the df32 acceptance residual reaches the same
    deep tolerance as the f64-residual refined path, with f64 in/out."""
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.problems import bratu2d

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)

    u_df, info_df = jax.jit(lambda u: newton_krylov_jit(
        bratu2d.residual_scaled, u, p, algo="cg", tol_rel=1e-10,
        krylov_dtype=jnp.float32, residual_df=bratu2d.residual_scaled_df,
    ))(u0)
    assert bool(info_df.solved)
    assert u_df.dtype == jnp.float64

    u_64, info_64 = jax.jit(lambda u: newton_krylov_jit(
        bratu2d.residual_scaled, u, p, algo="cg", tol_rel=1e-10,
        krylov_dtype=jnp.float32,
    ))(u0)
    assert bool(info_64.solved)
    # identical roots to the verification tolerance; df32 residual floor is
    # far below the 1e-10 target
    assert float(jnp.max(jnp.abs(u_df - u_64))) < 1e-9
    # true f64 residual at the df32 solution honors the advertised tolerance
    n_true = float(jnp.linalg.norm(bratu2d.residual_scaled(u_df, p)))
    n0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u0, p)))
    assert n_true <= 2e-10 * n0


def test_newton_jit_residual_df_f32_boundary():
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.problems import bratu2d

    n = 32
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float32)
    u, info = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-8,
        residual_df=bratu2d.residual_scaled_df,
    )
    assert bool(info.solved)
    assert u.dtype == jnp.float32  # f32 in -> f32 out


@pytest.mark.parametrize("jit", [False, True])
def test_bratu_residual_df_matches_f64(jit):
    """Both eager and STANDALONE-JIT (the fusion context in which XLA:CPU's
    simplifier folded the old shared-factor-product formulation)."""
    from newtonkrylov_tpu.problems import bratu2d

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u = bratu2d.initial_guess(n, dtype=jnp.float64) * 1.37
    r64 = bratu2d.residual_scaled(u, p)
    f = bratu2d.residual_scaled_df
    if jit:
        f = jax.jit(f, static_argnums=1)
    rdf = f(df32.df_from_f64(u), p)
    err = float(jnp.linalg.norm(df32.df_to_f64(rdf) - r64))
    # absolute error must sit far below the residual's own O(dx²) scale AND
    # below the 1e-8·‖F0‖ convergence target
    assert err < 1e-12 * float(jnp.linalg.norm(u))
    # the f32 norm of hi matches the f64 norm to f32 roundoff
    assert float(df32.norm_hi(rdf)) == pytest.approx(
        float(jnp.linalg.norm(r64)), rel=1e-5
    )


def test_newton_jit_flagship_config_df32_dst_once():
    """The bench flagship configuration end-to-end on CPU: df32 acceptance
    residual + DST-Poisson M (bf16x3 'high' on TPU; exact on CPU) +
    precond_refresh="once".  Guards the exact kwarg combination bench.py
    times, including the once-mode J0 construction on the df32 pair."""
    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.problems import bratu2d

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float64)

    u, info = jax.jit(lambda u: newton_krylov_jit(
        bratu2d.residual_scaled, u, p, algo="cg", tol_rel=1e-8,
        krylov_dtype=jnp.float32, residual_df=bratu2d.residual_scaled_df,
        max_niter=20, M=fft_poisson(precision="high"),
        precond_refresh="once",
    ))(u0)
    assert bool(info.solved)
    # near-exact preconditioning: ~1 inner per outer
    assert int(info.stats.inner_iterations) <= int(info.stats.outer_iterations) + 3
    n_true = float(jnp.linalg.norm(bratu2d.residual_scaled(u, p)))
    n0 = float(jnp.linalg.norm(bratu2d.residual_scaled(u0, p)))
    assert n_true <= 1.5e-8 * n0
