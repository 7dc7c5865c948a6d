"""Measure the >4096 ("XL") regime: single-chip 8192² Bratu JFNK solves.

Past ``fftprec._MATMUL_MAX_N`` (= 4096) the DST matmul engine is out of
validity range and the FFT engine is measured dead on TPU (20–24× slower,
fails to compile at 8192² — docs/design.md "DST engine crossover"), so the
documented recommendation for larger single-chip sides is the O(n²)
geometric V-cycle (docs/preconditioners.md).  This probe turns that
recommendation into a measurement: a df32-refined 8192² solve to
1e-8·‖F₀‖ with MG-PCG on one v5e chip — 64 M unknowns, ~2.1 GB of df32
state + Krylov vectors resident in HBM.

Measured (2026-08, real v5e, recorded in docs/design.md):
MG-PCG 1849.6 ms marginal/solve (8 outer / 43 inner, floor_limited),
two-grid 5233.3 ms (8/29); both solved=True, deterministic.

Protocol: bench.py's own lane harness, imported (``make_chain_solve`` /
``chain_wall``) so the XL lanes measure under the exact protocol of the
bench lanes they extend.  ~60 s whole-solve compile at 8192² keeps these
out of bench.py itself.

Run:  python benchmarks/xl8192.py [sizes...]    (default: 8192)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from bench import chain_wall, make_chain_solve
from newtonkrylov_tpu.mg import multigrid2d
from newtonkrylov_tpu.precond import two_grid
from newtonkrylov_tpu.problems import bratu2d


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8192]
    log(f"device: {jax.devices()[0]}, platform: {jax.default_backend()}")
    lanes = [("MG-PCG", multigrid2d(), "outer"),
             ("two-grid", two_grid(8, precision="high"), "once")]
    for ns in sizes:
        u0 = bratu2d.initial_guess(ns, dtype=jnp.float64)
        for tag, M, refresh in lanes:
            try:
                f = make_chain_solve(ns, M, refresh)
                t0 = time.perf_counter()
                float(f(u0, 1)[0])
                log(f"[{tag}] {ns}²: compile+first solve "
                    f"{time.perf_counter() - t0:.1f} s")
                float(f(u0, 3)[0])  # warm
                t1 = min(chain_wall(f, u0, 1, r) for r in range(2))
                t3 = min(chain_wall(f, u0, 3, r + 2) for r in range(2))
                ms = max(t3 - t1, 0.0) / 2 * 1e3
                _, info = f(u0, 1)
                log(f"JFNK df32-refined {ns}x{ns} to 1e-8 [{tag}]: "
                    f"marginal {ms:.1f} ms/solve, solved={bool(info.solved)} "
                    f"outer={int(info.stats.outer_iterations)} "
                    f"inner={int(info.stats.inner_iterations)}"
                    + (" floor_limited" if bool(info.floor_limited) else ""))
            except Exception as e:
                log(f"[{tag}] {ns}² FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
