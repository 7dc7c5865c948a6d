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
