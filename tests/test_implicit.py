"""Differentiable-solve (implicit function theorem) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from newtonkrylov_tpu.implicit import make_implicit_solver
from newtonkrylov_tpu.problems import bratu1d


def test_scalar_parameter_gradient_vs_fd():
    """d(sum u*)/dλ on a small Bratu system matches central differences."""
    n = 64
    dx = 1.0 / (n + 1)

    def F(u, lam):
        return bratu1d.residual_scaled(u, bratu1d.Params(dx=dx, lam=lam))

    u0 = bratu1d.initial_guess(n)
    solve = make_implicit_solver(F, algo="cg", tol_rel=1e-12)

    def loss(lam):
        return jnp.sum(solve(u0, lam))

    lam0 = 3.0
    g = float(jax.grad(loss)(lam0))
    eps = 1e-6
    fd = (float(loss(lam0 + eps)) - float(loss(lam0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_pytree_parameter_gradient():
    """Gradients w.r.t. a parameter pytree (dict of fields)."""
    n = 32

    def F(u, p):
        up = jnp.pad(u, 1)
        lap = up[2:] - 2.0 * u + up[:-2]
        return lap + p["scale"] * jnp.exp(u) + p["source"]

    u0 = jnp.zeros(n)
    p0 = {"scale": jnp.asarray(1e-3), "source": jnp.full(n, 1e-3)}
    solve = make_implicit_solver(F, algo="gmres", tol_rel=1e-12,
                                 krylov_kwargs={"restart": 32})

    def loss(p):
        u = solve(u0, p)
        return jnp.sum(u * u)

    g = jax.grad(loss)(p0)
    # fd check on the scalar leaf
    eps = 1e-6
    lp = lambda s: float(loss({**p0, "scale": jnp.asarray(s)}))
    fd = (lp(1e-3 + eps) - lp(1e-3 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g["scale"]), fd, rtol=1e-4)
    # fd check on one entry of the field leaf
    e = jnp.zeros(n).at[7].set(eps)
    fdf = (float(loss({**p0, "source": p0["source"] + e}))
           - float(loss({**p0, "source": p0["source"] - e}))) / (2 * eps)
    np.testing.assert_allclose(float(g["source"][7]), fdf, rtol=1e-4)


def test_no_gradient_to_initial_guess():
    n = 16

    def F(u, lam):
        up = jnp.pad(u, 1)
        return up[2:] - 2.0 * u + up[:-2] + lam * jnp.exp(u) * 1e-3

    solve = make_implicit_solver(F, algo="cg", tol_rel=1e-12)
    g = jax.grad(lambda u0: jnp.sum(solve(u0, 1.0)))(jnp.full(n, 0.1))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_grad_jittable():
    n = 32
    dx = 1.0 / (n + 1)

    def F(u, lam):
        return bratu1d.residual_scaled(u, bratu1d.Params(dx=dx, lam=lam))

    solve = make_implicit_solver(F, algo="cg", tol_rel=1e-12)
    g = jax.jit(jax.grad(lambda lam: jnp.sum(solve(bratu1d.initial_guess(n), lam))))(2.5)
    assert np.isfinite(float(g))
