"""Forcing-strategy arithmetic parity (src/Ariadne.jl:180-217)."""

import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu import EisenstatWalker, Fixed


def reference_ew(eta, tol, n_res, n_res_prior, eta_max=0.999, gamma=0.9):
    """Literal transcription of the reference formulas for oracle checking
    (src/Ariadne.jl:207-216)."""
    eta_res = gamma * n_res**2 / n_res_prior**2
    if gamma * eta**2 <= 1 / 10:
        eta_safe = min(eta_max, eta_res)
    else:
        eta_safe = min(eta_max, max(eta_res, gamma * eta**2))
    return min(eta_max, max(eta_safe, 0.5 * tol / n_res))


def test_fixed_default():
    f = Fixed()
    assert f.initial() == 0.1
    assert float(f(0.5, 1e-8, 1.0, 2.0)) == 0.1


def test_ew_initial_is_eta_max():
    # src/Ariadne.jl:217
    assert EisenstatWalker().initial() == 0.999
    assert EisenstatWalker(eta_max=0.68949).initial() == 0.68949


def test_ew_matches_reference_formulas():
    ew = EisenstatWalker()
    rng = np.random.default_rng(42)
    for _ in range(200):
        eta = float(rng.uniform(1e-6, 0.999))
        tol = 10.0 ** rng.uniform(-12, -2)
        n_prior = 10.0 ** rng.uniform(-6, 2)
        # both decreasing and increasing residuals
        n_res = n_prior * 10.0 ** rng.uniform(-3, 0.5)
        got = float(ew(jnp.float64(eta), tol, n_res, n_prior))
        want = reference_ew(eta, tol, n_res, n_prior)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ew_branches_hit():
    ew = EisenstatWalker()
    # gamma*eta^2 > 0.1 branch (eta close to 1)
    got = float(ew(jnp.float64(0.999), 1e-10, 0.5, 1.0))
    want = reference_ew(0.999, 1e-10, 0.5, 1.0)
    assert got == want
    # oversolving floor active: tiny n_res
    got = float(ew(jnp.float64(0.1), 1e-4, 1e-5, 1.0))
    want = reference_ew(0.1, 1e-4, 1e-5, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # eta_max cap
    got = float(ew(jnp.float64(0.1), 1e-12, 2.0, 1.0))
    assert got == 0.999
