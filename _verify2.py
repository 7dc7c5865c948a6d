import jax
import jax.numpy as jnp
import newtonkrylov_tpu as nk
from newtonkrylov_tpu.problems import bratu2d
from newtonkrylov_tpu.fftprec import fft_poisson

n = 512
p = bratu2d.default_config(n, lam=5.0)
u0 = bratu2d.initial_guess(n, dtype=jnp.float32)
u, info = jax.jit(lambda u0: nk.newton_krylov_jit(
    bratu2d.residual_scaled, u0, p, algo="cg", tol_rel=1e-2,
    max_niter=20, M=fft_poisson()))(u0)
print(f"dst f32 tol 1e-2: solved={bool(info.solved)} outer={int(info.stats.outer_iterations)} "
      f"inner={int(info.stats.inner_iterations)}")
assert bool(info.solved)
print("TPU smoke OK")
