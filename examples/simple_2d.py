"""Kelley2003 2x2 system: Newton-path traces over the residual-norm contour.

Mirrors examples/simple.jl of the reference: three starting points, the third
with the tuned forcing EisenstatWalker(eta_max=0.68949).
"""

import _common  # noqa: F401  (configures backend)
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from newtonkrylov_tpu import EisenstatWalker, newton_krylov
from newtonkrylov_tpu.problems import simple


def trace_from(x0, **kw):
    pts = []
    u, info = newton_krylov(
        simple.residual, jnp.asarray(x0),
        callback=lambda u, res, n: pts.append(np.asarray(u)),
        **kw,
    )
    print(f"x0={x0}: solved={bool(info.solved)} "
          f"outer={info.stats.outer_iterations} inner={info.stats.inner_iterations} "
          f"-> {np.asarray(u).round(6)}")
    return np.array(pts)


def main():
    xs = np.linspace(-3, 8, 300)
    ys = np.linspace(-15, 10, 300)
    X, Y = np.meshgrid(xs, ys)
    Z = np.hypot(X**2 + Y**2 - 2, np.exp(X - 1) + Y**2 - 2)

    fig, ax = plt.subplots(figsize=(7, 6))
    ax.contour(X, Y, Z, levels=np.geomspace(0.1, 4000, 25), linewidths=0.5)

    for x0, kw in [
        ([2.0, 0.5], {}),
        ([2.5, 3.0], {}),
        ([3.0, 4.0], {"forcing": EisenstatWalker(eta_max=simple.TUNED_ETA_MAX)}),
    ]:
        t = trace_from(x0, **kw)
        ax.plot(t[:, 0], t[:, 1], "o-", ms=3, label=f"x0={x0}")
    ax.legend()
    ax.set_title("Newton–Krylov paths on the Kelley 2×2 system")
    _common.save_plot(fig, "simple_traces.png")


if __name__ == "__main__":
    main()
