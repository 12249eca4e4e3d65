"""Exactness-class comparator (studio/exactness.py:40-272 parity)."""

import numpy as np
import pytest

from scpn_fusion_tpu.utils.exactness import (
    ExactnessClass, ReproVerdict, compare_bit_exact, compare_tolerance,
    parse_exactness_class, reproduce, value_digest, verify_lane_metric,
)


class TestBitExact:
    def test_match_and_drift(self):
        d = value_digest([1.0, 2.0])
        assert compare_bit_exact(d, d).verdict is ReproVerdict.MATCH
        d2 = value_digest([1.0, 2.0000001])
        v = compare_bit_exact(d2, d)
        assert v.verdict is ReproVerdict.DRIFT and not v.reproduced

    def test_digest_is_byte_level_not_repr(self):
        # 1e-6 and 0.000001 are the same float64 -> same digest
        assert value_digest(1e-6) == value_digest(0.000001)
        # digest is over LE bytes, stable across shapes only by content
        assert value_digest([1.0]) != value_digest([1.0, 1.0])


class TestTolerance:
    def test_within_and_beyond(self):
        assert compare_tolerance(1.0 + 1e-12, 1.0).reproduced
        assert not compare_tolerance(1.01, 1.0).reproduced
        assert compare_tolerance(1.01, 1.0, rtol=0.02).reproduced

    def test_finite_aware_nan_inf(self):
        a = np.array([1.0, np.nan, np.inf, -np.inf])
        assert compare_tolerance(a, a.copy()).reproduced
        b = a.copy(); b[1] = 0.0      # NaN mask differs -> drift
        assert not compare_tolerance(b, a).reproduced
        c = a.copy(); c[2] = -np.inf  # inf sign differs -> drift
        assert not compare_tolerance(c, a).reproduced

    def test_all_nonfinite_structural_match(self):
        a = np.array([np.nan, np.inf])
        assert compare_tolerance(a, a.copy()).reproduced

    def test_shape_mismatch_is_drift(self):
        assert not compare_tolerance(np.ones(3), np.ones(4)).reproduced

    def test_negative_band_rejected(self):
        with pytest.raises(ValueError):
            compare_tolerance(1.0, 1.0, rtol=-1.0)


class TestDispatch:
    def test_absent_class_unverifiable(self):
        v = reproduce(None)
        assert v.verdict is ReproVerdict.UNVERIFIABLE and not v.reproduced

    def test_stochastic_must_be_reduced(self):
        with pytest.raises(ValueError, match="seed-reduced"):
            reproduce(ExactnessClass.STOCHASTIC)

    def test_missing_payload_raises(self):
        with pytest.raises(ValueError):
            reproduce(ExactnessClass.BIT_EXACT)
        with pytest.raises(ValueError):
            reproduce(ExactnessClass.TOLERANCE, recomputed_value=1.0)

    def test_parse(self):
        assert parse_exactness_class("Bit-Exact") is ExactnessClass.BIT_EXACT
        assert parse_exactness_class("nonsense") is None
        assert parse_exactness_class(None) is None


class TestLaneVerify:
    LANE = {"metrics": {"tau_rmse_s": 0.0969}}

    def test_within(self):
        v = verify_lane_metric(self.LANE, "tau_rmse_s", 0.09690000001)
        assert v.reproduced

    def test_drift(self):
        assert not verify_lane_metric(self.LANE, "tau_rmse_s",
                                      0.12).reproduced

    def test_absent_metric_unverifiable(self):
        v = verify_lane_metric(self.LANE, "nope", 1.0)
        assert v.verdict is ReproVerdict.UNVERIFIABLE

    def test_committed_report_roundtrip(self):
        import json
        from pathlib import Path
        p = Path("validation/reports/confinement_burn.json")
        if not p.exists():
            pytest.skip("report absent")
        report = json.loads(p.read_text())
        lane = next(l for l in report["lanes"]
                    if "itpa" in l["name"])
        rmse = lane["metrics"].get("tau_rmse_s")
        if rmse is None:
            pytest.skip("metric renamed")
        assert verify_lane_metric(lane, "tau_rmse_s",
                                  float(rmse)).reproduced
