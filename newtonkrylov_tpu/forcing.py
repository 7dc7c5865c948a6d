"""Inexact-Newton forcing strategies.

The inner Krylov solve terminates when ``‖F′(u)d + F(u)‖ ≤ η·‖F(u)‖``; the
forcing term η is chosen per outer iteration.  Exact re-statement of the
reference's strategies (``src/Ariadne.jl:180-217``) as pure, jit-safe
functions of ``(η, tol, ‖F_k‖, ‖F_{k-1}‖)``:

* :class:`Fixed` — constant η (default 0.1, ``src/Ariadne.jl:185-192``).
* :class:`EisenstatWalker` — Eisenstat & Walker choice 2,
  ``η_res = γ‖F_k‖²/‖F_{k-1}‖²`` with the Eq.-3.6 safeguard (only retain the
  previous η's influence when ``γη² > 1/10``) and the Eq.-3.5 oversolving
  floor ``½·tol/‖F_k‖``, both capped at ``η_max``
  (``src/Ariadne.jl:204-217``).  η₀ = η_max (``src/Ariadne.jl:217``).

Iteration-count parity with the reference depends on reproducing this
arithmetic exactly, including the branch structure.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["Forcing", "Fixed", "EisenstatWalker"]


@dataclasses.dataclass(frozen=True)
class Forcing:
    """Base class: callable (η, tol, n_res, n_res_prior) → new η."""

    def __call__(self, eta, tol, n_res, n_res_prior):
        raise NotImplementedError

    def initial(self):
        """η₀ (the reference spells this ``inital`` — src/Ariadne.jl:192,217)."""
        raise NotImplementedError

    def host_update(self, eta, tol, n_res, n_res_prior):
        """Pure-Python-float update for the host-stepped Newton driver.

        Mathematically identical to ``__call__``; avoids dispatching tiny
        device ops per outer iteration (expensive on remote-attached TPUs).
        """
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Fixed(Forcing):
    """Constant forcing term (src/Ariadne.jl:183-192)."""

    eta: float = 0.1

    def __call__(self, eta, tol, n_res, n_res_prior):
        return jnp.asarray(self.eta, dtype=jnp.result_type(n_res))

    def initial(self):
        return self.eta

    def host_update(self, eta, tol, n_res, n_res_prior):
        return self.eta


@dataclasses.dataclass(frozen=True)
class EisenstatWalker(Forcing):
    """Eisenstat–Walker adaptive forcing (src/Ariadne.jl:195-217).

    η_max and γ defaults match the reference (0.999, 0.9).  The update is
    branch-free (jnp.where) so it can live inside a jitted Newton loop.
    """

    eta_max: float = 0.999
    gamma: float = 0.9

    def __call__(self, eta, tol, n_res, n_res_prior):
        g = self.gamma
        eta_res = g * (n_res * n_res) / (n_res_prior * n_res_prior)
        # Eq 3.6 safeguard (src/Ariadne.jl:209-214)
        geta2 = g * (eta * eta)  # γ·η² with the reference's association (γ * η^2)
        eta_safe = jnp.where(
            geta2 <= 0.1,
            jnp.minimum(self.eta_max, eta_res),
            jnp.minimum(self.eta_max, jnp.maximum(eta_res, geta2)),
        )
        # Eq 3.5 oversolving floor (src/Ariadne.jl:215)
        return jnp.minimum(self.eta_max, jnp.maximum(eta_safe, 0.5 * tol / n_res))

    def initial(self):
        return self.eta_max

    def host_update(self, eta, tol, n_res, n_res_prior):
        """Branchy Python-float transcription of src/Ariadne.jl:207-216."""
        g = self.gamma
        eta_res = g * (n_res * n_res) / (n_res_prior * n_res_prior)
        if g * (eta * eta) <= 0.1:
            eta_safe = min(self.eta_max, eta_res)
        else:
            eta_safe = min(self.eta_max, max(eta_res, g * (eta * eta)))
        return min(self.eta_max, max(eta_safe, 0.5 * tol / n_res))
