"""Multi-device halo-exchange Bratu solve (the real version of the
reference's halovector/bratu_ka scaffold): block-shard the 2-D interior over
a device mesh, exchange ghosts by ppermute, psum all reductions, and check
the result is identical to the single-device solve.

Runs on 8 virtual CPU devices out of the box; the same code targets ICI on a
TPU slice.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from newtonkrylov_tpu import newton_krylov_jit
from newtonkrylov_tpu.halo import make_mesh, newton_krylov_sharded, sharded_residual_2d
from newtonkrylov_tpu.problems import bratu2d


def padded_residual(up, p):
    u = up[1:-1, 1:-1]
    stencil = up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2] - 4.0 * u
    return stencil + (p.dx * p.dx) * p.lam * jnp.exp(u)


def main():
    print(f"devices: {len(jax.devices())}")
    n = 64
    p = bratu2d.default_config(n, lam=5.0)
    u0 = bratu2d.initial_guess(n)

    u_ref, info_ref = newton_krylov_jit(bratu2d.residual_scaled, u0, p, algo="cg")

    for shape, axes, spec in [((2, 2), ("i", "j"), P("i", "j")),
                              ((8,), ("i",), P("i", None))]:
        mesh = make_mesh(shape, axes)
        F_local = sharded_residual_2d(
            padded_residual, (axes[0], axes[1] if len(axes) > 1 else None), "dirichlet"
        )
        u_sh, info_sh = newton_krylov_sharded(
            F_local, u0, p, mesh, spec, newton_kwargs={"algo": "cg"}
        )
        diff = float(jnp.max(jnp.abs(np.asarray(u_sh) - np.asarray(u_ref))))
        print(f"mesh {shape}: solved={bool(info_sh.solved)} "
              f"outer={int(info_sh.stats.outer_iterations)} "
              f"inner={int(info_sh.stats.inner_iterations)} "
              f"(single-device: {int(info_ref.stats.inner_iterations)}) "
              f"max|Δu|={diff:.2e}")

    # The flagship preconditioner, sharded-exact: fft_poisson(scope="global")
    # runs the same DST eigen-solve as the single-chip flagship through
    # distributed MXU matmuls (tiled reduce-scatters, no all_gather) —
    # iteration counts match the single-device preconditioned solve exactly.
    from newtonkrylov_tpu.fftprec import fft_poisson

    u_d1, info_d1 = newton_krylov_jit(
        bratu2d.residual_scaled, u0, p, algo="cg", M=fft_poisson())
    mesh = make_mesh((2, 4), ("i", "j"))
    F_local = sharded_residual_2d(padded_residual, ("i", "j"), "dirichlet")
    u_d8, info_d8 = newton_krylov_sharded(
        F_local, u0, p, mesh, P("i", "j"),
        newton_kwargs={"algo": "cg",
                       "M": fft_poisson(axis_names=("i", "j"), scope="global")})
    diff = float(jnp.max(jnp.abs(np.asarray(u_d8) - np.asarray(u_d1))))
    print(f"mesh (2, 4) + global DST: solved={bool(info_d8.solved)} "
          f"inner={int(info_d8.stats.inner_iterations)} "
          f"(single-device DST: {int(info_d1.stats.inner_iterations)}) "
          f"max|Δu|={diff:.2e}")


if __name__ == "__main__":
    main()
