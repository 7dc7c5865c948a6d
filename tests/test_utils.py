"""Auxiliary subsystems: checkpoint/resume, profiling timers, solve reports."""

import os

import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu.problems import spring
from newtonkrylov_tpu.timestep import integrate
from newtonkrylov_tpu.utils.checkpointing import (
    MarchCheckpoint,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from newtonkrylov_tpu.utils.profiling import PhaseTimer, solve_report


def test_checkpoint_roundtrip(tmp_path):
    u = {"a": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    path = save_checkpoint(
        str(tmp_path / "march_10"), MarchCheckpoint(u=u, t=1.5, step=10, extra={"dt": 0.1})
    )
    ck = load_checkpoint(path, u)
    np.testing.assert_allclose(ck.u["a"], u["a"])
    np.testing.assert_allclose(ck.u["b"], u["b"])
    assert ck.t == 1.5 and ck.step == 10
    assert ck.extra["dt"] == 0.1


def test_latest_checkpoint(tmp_path):
    u = jnp.zeros(3)
    for k in (5, 20, 10):
        save_checkpoint(str(tmp_path / f"march_{k}"), MarchCheckpoint(u, 0.0, k, {}))
    assert latest_checkpoint(str(tmp_path)).endswith("march_20.npz")
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_integrate_checkpoint_resume(tmp_path):
    """March 10 steps with checkpoints; resume from step 5 reproduces the
    uninterrupted result."""
    p = spring.default_config()
    u0 = spring.initial_condition()
    full = integrate("midpoint", spring.rhs, u0, p, 0.1, 1.0)

    integrate(
        "midpoint", spring.rhs, u0, p, 0.1, 0.5,
        checkpoint_dir=str(tmp_path), checkpoint_every=5,
    )
    assert os.path.exists(tmp_path / "march_5.npz")
    resumed = integrate(
        "midpoint", spring.rhs, u0, p, 0.1, 1.0,
        checkpoint_dir=str(tmp_path), resume=True,
    )
    np.testing.assert_allclose(np.asarray(resumed.u), np.asarray(full.u), rtol=1e-12)
    # resumed march only performed the remaining 5 steps
    assert len(resumed.outer_iterations) == 5


def test_phase_timer():
    t = PhaseTimer()
    with t("phase_a"):
        sum(range(1000))
    with t("phase_a"):
        pass
    with t("phase_b", block=jnp.ones(4) * 2):
        pass
    assert t.counts["phase_a"] == 2
    assert t.totals["phase_a"] > 0
    assert "phase_a" in t.summary() and "phase_b" in t.summary()


def test_solve_report():
    from newtonkrylov_tpu import newton_krylov
    from newtonkrylov_tpu.problems import simple

    u, info = newton_krylov(simple.residual, jnp.array([2.0, 0.5]))
    rep = solve_report(info, 2)
    assert "solved=True" in rep and "matvec/s" in rep


def test_weak_scaling_harness_structure():
    """Harness runs over virtual devices and returns sane records (real
    efficiency needs real chips; virtual CPU devices share host cores)."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from newtonkrylov_tpu.utils.scaling import weak_scaling_matvec

    pts = weak_scaling_matvec(local_n=32, device_counts=[1, 2], chain=5, repeats=1)
    assert [p.n_devices for p in pts] == [1, 2]
    assert all(p.matvecs_per_s > 0 for p in pts)
    assert pts[0].efficiency == 1.0


def test_export_roundtrip(tmp_path):
    """AOT-exported solve serializes, reloads, and reproduces the live solve."""
    import jax

    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.utils.serving import export_solver, load_exported, save_exported

    n = 16
    p = bratu2d.default_config(n, lam=4.0)
    f = jax.jit(lambda u0: newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")[0])
    u0 = bratu2d.initial_guess(n)

    exp = export_solver(f, (u0,))
    path = save_exported(exp, str(tmp_path / "solve.bin"))
    re = load_exported(path)
    u_aot = re.call(u0)
    np.testing.assert_allclose(np.asarray(u_aot), np.asarray(f(u0)), atol=1e-12)


def test_export_roundtrip_production_config(tmp_path):
    """The PRODUCTION configuration (df32-refined 1e-8 DST flagship —
    exactly what __graft_entry__.entry certifies) AOT-exports and
    round-trips: the df32 while-loop refinement, the hoisted bf16x3 DST
    preconditioner, and the f32 Krylov loop all serialize to StableHLO."""
    import jax

    from newtonkrylov_tpu import newton_krylov_jit
    from newtonkrylov_tpu.fftprec import fft_poisson
    from newtonkrylov_tpu.problems import bratu2d
    from newtonkrylov_tpu.utils.serving import export_solver, load_exported, save_exported

    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n, dtype=jnp.float32)

    def fn(u0):
        u, info = newton_krylov_jit(
            bratu2d.residual_scaled, u0, p,
            algo="cg", tol_rel=1e-8, krylov_dtype=jnp.float32,
            residual_df=bratu2d.residual_scaled_df,
            max_niter=20, M=fft_poisson(precision="high"),
            precond_refresh="once")
        return u, info.stats.outer_iterations, info.stats.inner_iterations

    f = jax.jit(fn)
    exp = export_solver(f, (u0,))
    path = save_exported(exp, str(tmp_path / "prod.bin"))
    re = load_exported(path)
    u_aot, outer_aot, inner_aot = re.call(u0)
    u_live, outer_live, inner_live = f(u0)
    assert int(outer_aot) == int(outer_live)
    assert int(inner_aot) == int(inner_live)
    np.testing.assert_allclose(np.asarray(u_aot), np.asarray(u_live), atol=1e-12)


def test_export_roundtrip_ptc(tmp_path):
    """pseudo_transient AOT-exports like the Newton drivers: the SER
    while-loop and the shifted-operator solve serialize to StableHLO."""
    import jax
    import jax.numpy as jnp

    from newtonkrylov_tpu import pseudo_transient
    from newtonkrylov_tpu.utils.serving import export_solver, load_exported, save_exported

    F = lambda x, p: jnp.arctan(x)
    f = jax.jit(lambda x0: pseudo_transient(F, x0)[0])
    x0 = jnp.array([3.0])

    exp = export_solver(f, (x0,))
    path = save_exported(exp, str(tmp_path / "ptc.bin"))
    re = load_exported(path)
    np.testing.assert_allclose(np.asarray(re.call(x0)), np.asarray(f(x0)), atol=1e-12)
    assert abs(float(re.call(x0)[0])) < 1e-5
