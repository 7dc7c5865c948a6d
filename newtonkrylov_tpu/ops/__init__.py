"""Spatial operators: stencils (XLA + Pallas) and SBP/DG derivative operators."""

from .stencil import laplacian_1d, laplacian_2d, pad_dirichlet, pad_periodic

__all__ = ["laplacian_1d", "laplacian_2d", "pad_dirichlet", "pad_periodic"]
