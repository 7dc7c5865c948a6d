"""Quantitative weak-scaling model for the halo-exchange matvec (VERDICT r2
weak #3): bytes-exchanged vs bytes-computed per local block against ICI/HBM
ratios, so the ≥90% north star (BASELINE.md) is a *prediction with stated
constants* instead of an aspiration the single-chip environment cannot test.

Model
-----
Weak scaling: each chip holds a constant ``b × b`` f32 interior block of the
global 2-D grid, block-sharded over a 2-D mesh riding the v5e 2-D ICI torus
(each mesh axis maps to a torus axis, so every neighbor exchange is a
single-hop ppermute on its own link — the layout rule `halo.make_mesh`
encodes).

Per matvec and chip:

* compute: t_c(b) — measured on the real chip (bench.py chain kernel,
  18.5 µs at b=2048; VPU/HBM-bound, scales ~b² with a fixed-cost floor).
* exchange: 4 edges of b f32 words.  The +i/−i/+j/−j ppermutes use four
  DISTINCT torus links simultaneously, so the wire time is one edge per
  link: t_x(b) = 4·b bytes / BW_ici + t_lat (per-hop latency, ~1 µs).
* reductions: CG costs 2 scalar psums per iteration — latency-bound tree
  over the mesh: t_r ≈ 2 · ceil(log2(P)) · t_lat, amortized over
  (1 + degree) matvecs when the Chebyshev preconditioner runs degree
  reduction-free matvecs per CG dot (precond.chebyshev's design point).

Efficiencies (vs the 1-chip rate at the same b):

* no overlap:  E = t_c / (t_c + t_x + t_r)
* overlapped (halo.sharded_residual_2d's default: interior stencil runs
  while ppermutes are in flight, edges patched after):
              E = t_c / (max(t_c, t_x) + t_r) — the exchange hides entirely
  while t_x ≤ t_c (holds down to b ≈ 256 on v5e), but the reduction stays on
  the critical path: a CG dot is sequentially dependent on the matvec, so
  its tree latency cannot hide behind compute — only amortize across the
  preconditioner's reduction-free matvecs.

Constants (public: jax-ml.github.io/scaling-book, TPU v5e):
  BW_ici = 45 GB/s per link per direction (2-D torus, 4 links/chip),
  t_lat ≈ 1 µs per hop, BW_hbm = 819 GB/s.

The model is deliberately matvec-level — that is BASELINE.md's north-star
metric — and conservative: it charges the full edge wire time even though
the overlapped schedule also hides latency, and it ignores that XLA batches
the two axis-0 ppermutes into one collective-permute pair.

Usage: python benchmarks/scaling_model.py  → table to stdout, JSON blob on
the last line (embedded into SCALING_r04.json by run_scaling.py).
"""

import json

# v5e public constants (scaling-book). Override for other generations.
BW_ICI = 45e9          # bytes/s per link per direction
T_LAT = 1e-6           # seconds per ICI hop
BW_HBM = 819e9         # bytes/s

# Measured single-chip matvec times (bench.py VMEM chain kernel, f32,
# BENCH_r03): t_c(2048) = 18.5 µs. Smaller blocks keep the same per-element
# rate until the ~2 µs kernel-launch floor binds (measured: the fused
# single-step kernel at 512² sits on that floor).
T_C_2048 = 18.5e-6
T_FLOOR = 2.0e-6

# Measured single-chip DST-Poisson apply (bf16x3 "high", 2048², bench
# flagship attribution in docs/design.md: at the MXU matmul roofline).
T_DST_2048 = 1.084e-3


def t_compute(b: int) -> float:
    return max(T_C_2048 * (b / 2048.0) ** 2, T_FLOOR)


def t_exchange(b: int, dtype_bytes: int = 4) -> float:
    # 4 edges on 4 distinct torus links in parallel: wire time of ONE edge.
    return b * dtype_bytes / BW_ICI + T_LAT


def t_reduce(n_chips: int) -> float:
    import math
    return 2.0 * math.ceil(math.log2(max(n_chips, 2))) * T_LAT


def model_point(b: int, n_chips: int, cheb_degree: int = 0) -> dict:
    tc, tx = t_compute(b), t_exchange(b)
    # reductions amortized over the matvecs between CG dots
    tr = t_reduce(n_chips) / (1 + cheb_degree)
    return {
        "local_block": b,
        "n_chips": n_chips,
        "bytes_computed": 3 * b * b * 4,      # v in, w in, out (HBM window)
        "bytes_exchanged": 4 * b * 4,         # 4 edges, f32
        "comm_compute_byte_ratio": (4 * b * 4) / (3 * b * b * 4),
        "t_compute_us": tc * 1e6,
        "t_exchange_us": tx * 1e6,
        "t_reduce_amortized_us": tr * 1e6,
        "eff_no_overlap": tc / (tc + tx + tr),
        "eff_overlapped": tc / (max(tc, tx) + tr),
    }


def dst_apply_point(b: int, n_chips: int) -> dict:
    """Per-device cost of ONE global-DST apply (fft_poisson scope="global").

    Square p×p mesh, local block b×b, global side n = p·b.  Total transform
    flops (8·n³ per apply) divide *exactly* evenly: 8·n³/P = 8·b³·√P flops
    per device per apply — strong-scaling perfect, but under WEAK scaling
    the per-device matmul work grows ∝ √P because the replicated sine basis
    grows with the global side.  MXU time is calibrated from the measured
    single-chip apply (T_DST_2048, at the matmul roofline).  Communication:
    each of the 4 transforms reduce-scatters an (n × b) partial over its
    p-device mesh line — ≈ ((p−1)/p)·n·b·4 bytes per device on ICI.

    The crossover this table exposes: the DST apply stays cheap relative to
    its own matvecs while √P · (b/2048)³ is small; past that the flat-cost
    sharded preconditioners (Chebyshev/two-grid, O(b²) per device) win weak
    scaling even at worse iteration counts.
    """
    import math

    p = math.isqrt(n_chips)
    if p * p != n_chips:
        raise ValueError("n_chips must be a perfect square (square mesh)")
    n = p * b
    t_mxu = T_DST_2048 * (b / 2048.0) ** 3 * p  # 8 b³ √P flops at roofline
    rs_bytes = 4 * ((p - 1) / max(p, 1)) * n * b * 4  # 4 transforms, f32
    t_rs = rs_bytes / BW_ICI + 4 * max(p - 1, 0) * T_LAT
    return {
        "local_block": b,
        "n_chips": n_chips,
        "global_side": n,
        "t_mxu_us": t_mxu * 1e6,
        "t_reduce_scatter_us": t_rs * 1e6,
        "rs_share": t_rs / (t_mxu + t_rs),
    }


def measured_config_point(b: int, n_chips: int, per_inner: dict,
                          matvec_equiv: float,
                          overlap_reductions: bool = False) -> dict:
    """Per-Krylov-inner-iteration time budget from *measured* collective
    counts (benchmarks/collectives.py; VERDICT r3 next #2) instead of the
    analytic amortization assumption of :func:`model_point`.

    ``per_inner`` is the traced program's per-inner-iteration collective
    count dict (keys ``ppermute``/``psum``/``psum_scatter``);
    ``matvec_equiv`` the number of b×b stencil-apply-equivalents of local
    compute per inner iteration (1 for plain CG's matvec; 17 for
    Cheb(16)+matvec).  Square p×p mesh.  Conservative: halo-exchange
    rounds (4 measured ppermutes = one round on 4 distinct torus links)
    are charged at full wire time, psums at full tree latency, each
    psum_scatter at its (n × b)-partial wire time; the DST's distributed
    matmul compute is charged per psum_scatter/4 applies at the measured
    single-chip roofline rate.

    ``overlap_reductions=True`` models an iteration whose reduction is
    data-INDEPENDENT of its matvec + preconditioner apply — pipelined CG
    (``solvers.cg(pipeline=True)``, one fused psum per inner issued before
    the heavy ops): the psum tree latency then rides inside
    ``max(t_compute, ...)`` instead of adding to the critical path.
    Plain CG's pAp psum gates α and cannot overlap (the default).
    """
    import math

    p = math.isqrt(n_chips)
    if p * p != n_chips:
        raise ValueError("n_chips must be a perfect square (square mesh)")
    tc = matvec_equiv * t_compute(b)
    rounds = per_inner.get("ppermute", 0) / 4.0
    tx = rounds * t_exchange(b)
    tr = per_inner.get("psum", 0) * math.ceil(math.log2(max(n_chips, 2))) * T_LAT
    n_rs = per_inner.get("psum_scatter", 0)
    t_rs = 0.0
    if n_rs:
        n = p * b
        per_rs = ((p - 1) / p) * n * b * 4 / BW_ICI + max(p - 1, 0) * T_LAT
        t_rs = n_rs * per_rs
        tc += (n_rs / 4.0) * T_DST_2048 * (b / 2048.0) ** 3 * p  # DST matmuls
    if overlap_reductions:
        total = max(tc, tx, tr) + t_rs
    else:
        total = max(tc, tx) + tr + t_rs
    return {
        "local_block": b, "n_chips": n_chips,
        "per_inner_counts": dict(per_inner),
        "matvec_equiv": matvec_equiv,
        "overlap_reductions": overlap_reductions,
        "t_compute_us": tc * 1e6, "t_exchange_us": tx * 1e6,
        "t_reduce_us": tr * 1e6, "t_reduce_scatter_us": t_rs * 1e6,
        "eff_overlapped": tc / total,
        "comm_share": (tx + tr + t_rs) / (tc + tx + tr + t_rs),
    }


def main():
    rows = []
    print(f"{'b':>6} {'chips':>6} {'t_c us':>8} {'t_x us':>8} {'t_r us':>8} "
          f"{'E_seq':>7} {'E_ovl':>7}")
    for b in (256, 512, 1024, 2048):
        for n in (4, 16, 64, 256):
            r = model_point(b, n, cheb_degree=16)
            rows.append(r)
            print(f"{b:>6} {n:>6} {r['t_compute_us']:>8.2f} "
                  f"{r['t_exchange_us']:>8.2f} "
                  f"{r['t_reduce_amortized_us']:>8.2f} "
                  f"{r['eff_no_overlap']:>7.1%} {r['eff_overlapped']:>7.1%}")
    dst_rows = []
    print(f"\nglobal-DST apply (fft_poisson scope=\"global\"):")
    print(f"{'b':>6} {'chips':>6} {'n_glob':>7} {'t_mxu us':>9} "
          f"{'t_rs us':>8} {'rs%':>6}")
    for b in (512, 1024, 2048):
        for nc in (4, 16, 64, 256):
            r = dst_apply_point(b, nc)
            dst_rows.append(r)
            print(f"{b:>6} {nc:>6} {r['global_side']:>7} "
                  f"{r['t_mxu_us']:>9.0f} {r['t_reduce_scatter_us']:>8.1f} "
                  f"{r['rs_share']:>6.1%}")
    blob = {
        "model": "v5e 2-D torus halo matvec (see module docstring)",
        "constants": {"bw_ici_B_per_s": BW_ICI, "t_lat_s": T_LAT,
                      "t_c_2048_s": T_C_2048, "t_dst_2048_s": T_DST_2048,
                      "cheb_degree": 16},
        "points": rows,
        "dst_apply_points": dst_rows,
    }
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
