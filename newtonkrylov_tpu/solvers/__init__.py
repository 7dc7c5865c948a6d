"""Matrix-free Krylov solvers (the reference's Krylov.jl layer, rebuilt TPU-native).

Algorithm menu mirrors what the reference exercises through
``krylov_workspace(algo, kc)`` (src/Ariadne.jl:318): ``gmres`` (default),
``cg``, ``fgmres``, ``bicgstab``, ``cgls``.
"""

from __future__ import annotations

from .bicgstab import bicgstab, cgls
from .cg import cg
from .common import KrylovResult
from .gmres import fgmres, gmres

_ALGOS = {
    "gmres": gmres,
    "fgmres": fgmres,
    "cg": cg,
    "bicgstab": bicgstab,
    "cgls": cgls,
}

__all__ = ["gmres", "fgmres", "cg", "bicgstab", "cgls", "solve", "KrylovResult", "available_algos"]


def available_algos():
    return sorted(_ALGOS)


def solve(algo: str, A, b, x0=None, **kwargs) -> KrylovResult:
    """Dispatch on algorithm name (the ``algo`` symbol of src/Ariadne.jl:295).

    kwargs are filtered to what the algorithm accepts, mirroring how the
    reference forwards ``krylov_kwargs`` plus M/N/rtol to ``krylov_solve!``
    (src/Ariadne.jl:323-338).
    """
    try:
        fn = _ALGOS[algo]
    except KeyError:
        raise ValueError(f"unknown algo {algo!r}; available: {available_algos()}") from None

    import inspect

    params = inspect.signature(fn).parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        filtered = kwargs  # fn forwards **kwargs itself (e.g. fgmres → gmres)
    else:
        filtered = {k: v for k, v in kwargs.items() if k in params}
    return fn(A, b, x0, **filtered)
