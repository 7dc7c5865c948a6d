"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock bracketing of a whole
solve via ``time_ns()`` (src/Ariadne.jl:301,370-371).  Production TPU use
needs more (SURVEY.md §5 "Tracing/profiling"): per-phase timers, device
profiler traces, and throughput summaries.

* :class:`PhaseTimer` — named host-side accumulating timers with a context
  manager; tolerant of async dispatch (explicitly blocks on provided
  arrays).
* :func:`trace` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory (no-op with a warning if the backend can't profile, e.g.
  tunnel-attached chips).
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough for marking
  solver phases (JVP / orthogonalization / halo exchange) inside traces.
* :func:`solve_report` — human-readable throughput summary from a
  :class:`~newtonkrylov_tpu.newton.NewtonInfo` (matvecs/s, time per outer).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax

__all__ = ["PhaseTimer", "trace", "annotate", "solve_report", "time_chain"]


def time_chain(fn, a, b, *, chain: int = 200, repeats: int = 3):
    """Iterations/s of ``x ← fn(x, b)·0.125`` with overhead cancellation.

    Timing discipline for remote-attached chips (see docs/design.md): each
    timed program returns a 4-byte scalar synced with ``float()``, inputs
    vary across repetitions so no layer can dedupe identical dispatches, and
    fixed dispatch/transfer overhead is cancelled by differencing a short
    and a long chain.  Shared by bench.py and the scaling harness.
    """
    import jax.numpy as jnp
    from jax import lax

    def make(k):
        @jax.jit
        def f(a, b):
            out = lax.fori_loop(0, k, lambda i, x: fn(x, b) * 0.125, a)
            return jnp.sum(jnp.stack([jnp.sum(l) for l in jax.tree.leaves(out)]))

        return f

    k_s, k_l = max(1, chain // 10), chain
    fs, fl = make(k_s), make(k_l)
    float(fs(a, b))
    float(fl(a, b))

    def best(f):
        ts = []
        for r in range(repeats):
            ar = jax.tree.map(lambda l: l * (1.0 + 1e-4 * (r + 1)), a)
            t0 = time.perf_counter()
            float(f(ar, b))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = best(fl) - best(fs)
    return (k_l - k_s) / max(dt, 1e-9)


class PhaseTimer:
    """Accumulating named timers: ``with timer("jvp"): ...``.

    Pass arrays to ``block=`` to ensure device work is included (remember
    that dispatch is async; on some attached-TPU deployments even
    ``block_until_ready`` is advisory, so prefer materializing a small
    scalar).
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:10.4f}s  x{c:<6d} ({t/max(c,1)*1e3:9.3f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profiler trace into ``logdir`` (TensorBoard format)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # tunnel-attached chips may not support profiling
        print(f"[profiling] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                print(f"[profiling] stop_trace failed: {e}")


def annotate(name: str):
    """Named region for profiler traces (host annotation)."""
    return jax.profiler.TraceAnnotation(name)


def solve_report(info, n_unknowns: int, wall_s: Optional[float] = None) -> str:
    """Throughput summary for a finished Newton solve."""
    outer = int(info.stats.outer_iterations)
    inner = int(info.stats.inner_iterations)
    t = float(wall_s if wall_s is not None else (info.t or 0.0))
    fl = bool(getattr(info, "floor_limited", False) or False)
    lines = [
        f"solved={bool(info.solved)}  outer={outer}  inner={inner}  "
        f"final |F|={float(info.stats.n_res):.3e}"
        + ("  [floor_limited: tol clamped to the df32 representation floor]"
           if fl else ""),
    ]
    if t > 0:
        lines.append(
            f"wall={t:.3f}s  {inner / t:.1f} matvec/s  "
            f"{n_unknowns * inner / t:.3e} point-updates/s"
        )
    return "\n".join(lines)
