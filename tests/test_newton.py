"""Newton–Krylov end-to-end tests.

Tier 1 of the reference's test strategy (test/runtests.jl:15-23): solver smoke
tests on the Kelley 2x2 system from both documented starting points, plus
driver-equivalence, callback, forcing-variant, blow-up and jit-driver checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonkrylov_tpu import (
    EisenstatWalker,
    Fixed,
    newton_krylov,
    newton_krylov_jit,
)


def F_kelley(x, p):
    return jnp.array([
        x[0] ** 2 + x[1] ** 2 - 2.0,
        jnp.exp(x[0] - 1.0) + x[1] ** 2 - 2.0,
    ])


ROOT = np.array([1.0, 1.0])  # F(1,1) = 0


def test_solve_from_first_start():
    # cf. test/runtests.jl:15-18 (x0 = [2.0, 0.5])
    u, info = newton_krylov(F_kelley, jnp.array([2.0, 0.5]))
    assert info.solved
    np.testing.assert_allclose(u, ROOT, atol=1e-5)


def test_solve_from_second_start():
    # cf. test/runtests.jl:20-23 (x0 = [3.0, 5.0]); the system has two roots,
    # the reference asserts only stats.solved — we additionally check F(u)≈0.
    u, info = newton_krylov(F_kelley, jnp.array([3.0, 5.0]))
    assert info.solved
    np.testing.assert_allclose(F_kelley(u, None), 0.0, atol=1e-5)


def test_stats_populated():
    u, info = newton_krylov(F_kelley, jnp.array([2.0, 0.5]))
    assert info.stats.outer_iterations > 0
    assert info.stats.inner_iterations > 0
    assert info.stats.n_res <= 1e-6 * 2.0  # tol = tol_rel*|F(u0)| + tol_abs
    assert info.t > 0


def test_callback_trace():
    # the per-iteration callback seam (src/Ariadne.jl:299-304,351;
    # used for Newton-path traces in examples/simple.jl:25-48)
    trace = []
    newton_krylov(
        F_kelley, jnp.array([2.0, 0.5]),
        callback=lambda u, res, n_res: trace.append((np.array(u), float(n_res))),
    )
    assert len(trace) >= 2
    # First entry is the initial point; residuals must reach below tol.
    np.testing.assert_allclose(trace[0][0], [2.0, 0.5])
    assert trace[-1][1] < 1e-5


def test_fixed_forcing():
    u, info = newton_krylov(F_kelley, jnp.array([2.0, 0.5]), forcing=Fixed(0.1))
    assert info.solved


def test_no_forcing_exact_newton():
    # forcing=nothing → exact Newton (src/Ariadne.jl:293,308-310)
    u, info = newton_krylov(F_kelley, jnp.array([2.0, 0.5]), forcing=None)
    assert info.solved
    np.testing.assert_allclose(u, ROOT, atol=1e-6)


def test_tuned_eta_max():
    # examples/simple.jl:44 uses EisenstatWalker(η_max = 0.68949)
    u, info = newton_krylov(
        F_kelley, jnp.array([3.0, 4.0]),
        forcing=EisenstatWalker(eta_max=0.68949),
    )
    assert info.solved


def test_max_niter_respected():
    u, info = newton_krylov(F_kelley, jnp.array([3.0, 5.0]), max_niter=1)
    # loop runs while outer <= max_niter → at most max_niter+1 iterations
    assert info.stats.outer_iterations <= 2


def test_blowup_detection():
    def F_bad(x, p):
        return jnp.array([jnp.log(x[0]), x[1]])  # log goes NaN for x<=0

    u, info = newton_krylov(F_bad, jnp.array([0.5, 1.0]), forcing=None)
    # Must terminate (no hang) whether or not it solved.
    assert info.stats.outer_iterations <= 51


def test_jit_driver_matches_python_driver():
    u1, info1 = newton_krylov(F_kelley, jnp.array([2.0, 0.5]))
    u2, info2 = newton_krylov_jit(F_kelley, jnp.array([2.0, 0.5]))
    assert bool(info2.solved)
    np.testing.assert_allclose(u1, u2, atol=1e-10)
    assert int(info2.stats.outer_iterations) == info1.stats.outer_iterations
    assert int(info2.stats.inner_iterations) == info1.stats.inner_iterations


def test_jit_driver_history():
    u, info = newton_krylov_jit(F_kelley, jnp.array([2.0, 0.5]))
    hist = np.array(info.history)
    k = int(info.stats.outer_iterations)
    assert np.isfinite(hist[: k + 1]).all()
    assert np.isnan(hist[k + 1 :]).all()
    assert hist[k] == float(info.stats.n_res)


def test_jit_driver_is_jittable_end_to_end():
    @jax.jit
    def run(x0):
        u, info = newton_krylov_jit(F_kelley, x0)
        return u, info.solved, info.stats.outer_iterations

    u, solved, outer = run(jnp.array([2.0, 0.5]))
    assert bool(solved)
    np.testing.assert_allclose(u, ROOT, atol=1e-5)


def test_linesearch_armijo():
    u, info = newton_krylov(
        F_kelley, jnp.array([3.0, 5.0]), linesearch="armijo"
    )
    assert info.solved
    np.testing.assert_allclose(F_kelley(u, None), 0.0, atol=1e-5)


def test_pytree_state():
    def F(u, p):
        return {
            "a": u["a"] ** 2 + u["b"] ** 2 - 2.0,
            "b": jnp.exp(u["a"] - 1.0) + u["b"] ** 2 - 2.0,
        }

    u0 = {"a": jnp.array(2.0), "b": jnp.array(0.5)}
    u, info = newton_krylov(F, u0)
    assert info.solved
    np.testing.assert_allclose(u["a"], 1.0, atol=1e-5)
    np.testing.assert_allclose(u["b"], 1.0, atol=1e-5)


def test_vmap_batched_ensemble():
    """vmap over the fully-jitted solver: a batch of independent nonlinear
    solves runs as ONE SPMD program (lock-step outer/inner loops, per-lane
    convergence masks) — the batched-operator capability of
    src/Ariadne.jl:59-85 lifted to whole solves, which is the TPU-natural
    way to amortize small systems onto the VPU/MXU."""
    u0s = jnp.stack(
        [jnp.array([2.0, 0.5]), jnp.array([3.0, 5.0]), jnp.array([1.5, 1.5])]
    )
    us, infos = jax.vmap(lambda u0: newton_krylov_jit(F_kelley, u0, None))(u0s)
    assert bool(infos.solved.all())
    # lanes converge at their own Newton counts despite lock-step execution
    assert len(set(np.asarray(infos.stats.outer_iterations).tolist())) > 1
    for u in us:
        np.testing.assert_allclose(F_kelley(u, None), 0.0, atol=1e-4)
