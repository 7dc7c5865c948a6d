"""Run the five BASELINE.json configs end-to-end and record behavioral
fixtures (solved flags, iteration counts, residual histories, error norms).

These are the quantities the reference returns from every solve
(Stats + wall clock, src/Ariadne.jl:265-276,370-371) and the docs/parity
anchor for future comparison against a Julia run of the reference.

Usage: python benchmarks/run_configs.py  (CPU f64 by default; writes
benchmarks/baseline_configs.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("NK_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import newtonkrylov_tpu as nk
from newtonkrylov_tpu import precond
from newtonkrylov_tpu.halo import make_mesh, newton_krylov_sharded, sharded_residual_1d
from newtonkrylov_tpu.problems import bratu1d, bratu2d, bvp, heat1d, simple
from newtonkrylov_tpu.timestep import integrate


def record(info, **extra):
    out = {
        "solved": bool(info.solved),
        "outer": int(info.stats.outer_iterations),
        "inner": int(info.stats.inner_iterations),
        "n_res": float(info.stats.n_res),
    }
    if getattr(info, "history", None) is not None:
        h = np.asarray(info.history)
        out["residual_history"] = [float(x) for x in h[np.isfinite(h)]]
    out.update(extra)
    return out


def main():
    results = {}

    # 1. simple.jl small nonlinear system, JFNK + GMRES
    u, info = nk.newton_krylov_jit(simple.residual, jnp.array([2.0, 0.5]))
    results["simple_gmres"] = record(info, solution=[float(x) for x in np.asarray(u)])

    # 2. heat_1D implicit Euler time-step via Newton-Krylov inner solve
    p = heat1d.default_config(m=100, a=0.2)
    x = heat1d.grid(100)
    u0 = heat1d.clamp_bc(heat1d.initial_condition(x), p)
    r = integrate("euler", heat1d.rhs, u0, p, 0.1, 3.0)
    results["heat1d_implicit_euler"] = {
        "n_steps": int(len(r.outer_iterations)),
        "n_failed": int(r.n_failed),
        "outer_per_step": [int(v) for v in np.asarray(r.outer_iterations)],
        "final_norm": float(jnp.linalg.norm(r.u)),
    }

    # 3. bvp.jl two-point BVP with globalization (banded-LU recipe + Armijo)
    pb = bvp.default_config()
    U, info = nk.newton_krylov(
        bvp.residual, bvp.initial_guess(pb), pb,
        algo="gmres", N=precond.banded_lu(2, 2), linesearch="armijo",
    )
    results["bvp_fgmres_linesearch"] = record(
        info, bc_vp0=float(U[1]), bc_vend=float(U[-2])
    )

    # 4. 2-D Bratu, Eisenstat-Walker inexact Newton (refined to 1e-8)
    n2 = 256
    p2 = bratu2d.default_config(n2, lam=5.0)
    u2, info = nk.newton_krylov_jit(
        bratu2d.residual_scaled, bratu2d.initial_guess(n2, dtype=jnp.float64), p2,
        algo="cg", tol_rel=1e-8, krylov_dtype=jnp.float32,
    )
    results["bratu2d_ew"] = record(info, center=float(u2[n2 // 2, n2 // 2]))

    # 5. bratu_ka/halovector multi-partition Bratu: halo-exchange stencil JVP
    n1 = 1024
    p1 = bratu1d.default_config(n1, lam=3.0)

    def bratu1d_padded(yp, pp):
        y = yp[1:-1]
        return (yp[2:] - 2.0 * y + yp[:-2]) + (pp.dx * pp.dx) * pp.lam * jnp.exp(y)

    mesh = make_mesh((min(8, len(jax.devices())),), ("i",))
    F_local = sharded_residual_1d(bratu1d_padded, "i", "dirichlet")
    u_sh, info_sh = newton_krylov_sharded(
        F_local, bratu1d.initial_guess(n1), p1, mesh, P("i"),
        newton_kwargs={"algo": "cg"},
    )
    u_single, info_single = nk.newton_krylov_jit(
        bratu1d.residual_scaled, bratu1d.initial_guess(n1), p1, algo="cg"
    )
    results["bratu1d_multipartition"] = record(
        info_sh,
        n_partitions=int(mesh.devices.size),
        matches_single_device=bool(
            np.allclose(np.asarray(u_sh), np.asarray(u_single), atol=1e-9)
        ),
        single_device_inner=int(info_single.stats.inner_iterations),
    )

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_configs.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
