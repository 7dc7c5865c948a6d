"""The analytic ICI weak-scaling model (benchmarks/scaling_model.py) is a
shipped artifact (embedded in SCALING_r03.json): pin its structural claims
so constant edits can't silently invalidate the documented prediction."""

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "scaling_model",
    Path(__file__).resolve().parents[1] / "benchmarks" / "scaling_model.py",
)
sm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sm)


def test_exchange_grows_linear_compute_quadratic():
    p1, p2 = sm.model_point(512, 16), sm.model_point(2048, 16)
    assert p2["bytes_exchanged"] == 4 * p1["bytes_exchanged"]
    assert p2["bytes_computed"] == 16 * p1["bytes_computed"]


def test_north_star_prediction_holds_at_flagship_block():
    # the documented claim: >=95% overlapped efficiency at 2048^2 local
    # blocks through 256 chips with the Chebyshev(16) reduction amortizer
    for chips in (4, 16, 64, 256):
        p = sm.model_point(2048, chips, cheb_degree=16)
        assert p["eff_overlapped"] >= 0.95
        # and exchange fully hides under compute
        assert p["t_exchange_us"] <= p["t_compute_us"]


def test_reduction_latency_is_the_eroding_term():
    # without amortization (no polynomial preconditioner) efficiency at 256
    # chips must be strictly worse - the model's case for chebyshev
    bare = sm.model_point(2048, 256, cheb_degree=0)
    amortized = sm.model_point(2048, 256, cheb_degree=16)
    assert bare["eff_overlapped"] < amortized["eff_overlapped"]


def test_dst_apply_point_regimes():
    """The global-DST apply model (docs/design.md "three shapes"): per-device
    MXU time grows exactly with sqrt(P) under weak scaling (even flop
    division of the 8n^3 transform), comm share grows with P, and the
    calibration point reproduces the measured single-chip apply."""
    # calibration: P=1 would be the measured single-chip apply; check via
    # the P=4 point being exactly 2x the single-chip MXU time at b=2048
    p4 = sm.dst_apply_point(2048, 4)
    assert abs(p4["t_mxu_us"] - 2 * sm.T_DST_2048 * 1e6) < 1e-9
    # weak scaling: t_mxu scales with sqrt(P)
    p16 = sm.dst_apply_point(2048, 16)
    assert abs(p16["t_mxu_us"] / p4["t_mxu_us"] - 2.0) < 1e-12
    # comm share monotone in P at fixed b
    shares = [sm.dst_apply_point(1024, n)["rs_share"] for n in (4, 16, 64, 256)]
    assert shares == sorted(shares)
    # the documented few-chip regime: at b=2048, P=4 the apply is
    # MXU-majority (comm share < 50%)
    assert p4["rs_share"] < 0.5
