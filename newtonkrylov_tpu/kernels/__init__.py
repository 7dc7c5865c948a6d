"""Pallas TPU kernels for the hot operators.

The reference's kernel layer is KernelAbstractions.jl (the bratu_ka example,
``examples/bratu_ka.jl:13-34``) plus Krylov.jl's BLAS-1 inner loop; on TPU the
native equivalent is Pallas (SURVEY.md, "Size & languages").  Hot ops:

* :mod:`stencil2d` — fused 5-point stencil + diagonal JVP apply
  (the Arnoldi/CG hot matvec) with double-buffered HBM→VMEM DMA.
"""

from . import stencil2d

__all__ = ["stencil2d"]
