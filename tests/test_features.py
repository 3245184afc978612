"""Golden-value tests for per-window feature extraction, reproducing
the reference's ExtractFeatureTest assertions on reconstructed
fixtures (FIXTURES.md §2-3; reference
src/test/java/com/actitracker/data/ExtractFeatureTest.java:38-83).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.features import (
    extract_features,
)

SCHEMA = T.StructType(
    [
        T.StructField("g", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("acc_x", T.DoubleType()),
        T.StructField("acc_y", T.DoubleType()),
        T.StructField("acc_z", T.DoubleType()),
    ]
)


def _features(spark, rows, **kw):
    df = spark.createDataFrame(rows, schema=SCHEMA)
    out = extract_features(
        df,
        group_cols=["g"],
        axes={"x": "acc_x", "y": "acc_y", "z": "acc_z"},
        ts_col="timestamp",
        **kw,
    )
    return {r["g"]: r.asDict() for r in out.collect()}


# A static-phone-like fixture (FIXTURES.md §2): 4 samples whose exact
# statistics are hand-computable.
PHONE_ROWS = [
    (1, 0, -5.2, 8.1, 1.2),
    (1, 50, -5.3, 8.2, 1.3),
    (1, 100, -5.2, 8.0, 1.2),
    (1, 150, -5.3, 8.1, 1.1),
]


class TestGoldenAggregates:
    """mean / var_samp / avg-abs-diff / resultant on hand-computed data
    (ExtractFeatureTest.java:38-75 parity, exact instead of 2-decimal)."""

    @pytest.fixture(scope="class")
    def feats(self, spark):
        return _features(spark, PHONE_ROWS)[1]

    def test_mean(self, feats):
        assert feats["mean_x"] == pytest.approx(-5.25, abs=1e-12)
        assert feats["mean_y"] == pytest.approx(8.1, abs=1e-12)
        assert feats["mean_z"] == pytest.approx(1.2, abs=1e-12)

    def test_var_is_sample_variance(self, feats):
        # n-1 denominator (MultivariateOnlineSummarizer semantics, A4):
        # x deviations ±0.05 -> var = 4*0.0025/3
        assert feats["var_x"] == pytest.approx(0.01 / 3, rel=1e-9)
        assert feats["var_y"] == pytest.approx(0.02 / 3, rel=1e-9)
        assert feats["var_z"] == pytest.approx(0.02 / 3, rel=1e-9)

    def test_avg_abs_diff_two_pass(self, feats):
        # deviation from the group mean, then mean again (A6)
        assert feats["avg_abs_diff_x"] == pytest.approx(0.05, rel=1e-9)
        assert feats["avg_abs_diff_y"] == pytest.approx(0.05, rel=1e-9)
        assert feats["avg_abs_diff_z"] == pytest.approx(0.05, rel=1e-9)

    def test_resultant(self, feats):
        expect = sum(
            math.sqrt(x * x + y * y + z * z)
            for (_, _, x, y, z) in PHONE_ROWS
        ) / len(PHONE_ROWS)
        assert feats["resultant"] == pytest.approx(expect, rel=1e-12)
        assert 9.0 < feats["resultant"] < 10.5  # ~g, like the golden 9.73


class TestPeakTiming:
    """avg_time_peak semantics (ExtractFeature.java:87-116, golden
    value 1.0 at ExtractFeatureTest.java:78-83)."""

    def test_golden_one_tick_apart(self, spark):
        # peaks (y=10) at consecutive timestamps 1 tick apart,
        # interleaved sub-threshold rows -> avg delta between peak
        # timestamps 1.0 (FIXTURES.md §3 minimal equivalent fixture)
        rows = [
            (1, 1, 0.0, 10.0, 0.0),
            (1, 2, 0.0, 10.0, 0.0),
            (1, 3, 0.0, 10.0, 0.0),
            (1, 4, 0.0, 2.0, 0.0),
        ]
        feats = _features(spark, rows, peak_axis="acc_y")[1]
        assert feats["avg_time_peak"] == pytest.approx(1.0)

    def test_fewer_than_two_peaks_is_zero(self, spark):
        # ExtractFeature.java:97,115 — 0.0 when <2 peaks
        rows = [
            (1, 1, 0.0, 10.0, 0.0),
            (1, 2, 0.0, 1.0, 0.0),
            (1, 3, 0.0, 2.0, 0.0),
        ]
        feats = _features(spark, rows, peak_axis="acc_y")[1]
        assert feats["avg_time_peak"] == 0.0

    def test_zero_deltas_dropped(self, spark):
        # duplicate peak timestamps -> delta 0 dropped
        # (ExtractFeature.java:108); remaining delta = 5
        rows = [
            (1, 10, 0.0, 10.0, 0.0),
            (1, 10, 0.0, 10.0, 0.0),
            (1, 15, 0.0, 10.0, 0.0),
        ]
        feats = _features(spark, rows, peak_axis="acc_y")[1]
        assert feats["avg_time_peak"] == pytest.approx(5.0)

    def test_threshold_uses_untruncated_max(self, spark):
        # max = 12.3: threshold is 0.9*12.3 = 11.07, NOT
        # 0.9*floor(12.3) = 10.8 (summary over doubles,
        # RecognizeActivity.java:96-101).  The truncated sample 11 is
        # > 10.8 but NOT > 11.07, so the 11.9 row must not be a peak
        # and only one peak remains -> avg_time_peak = 0.0.
        rows = [
            (1, 1, 0.0, 12.3, 0.0),
            (1, 2, 0.0, 11.9, 0.0),  # long-trunc 11; peak iff wrong max
            (1, 3, 0.0, 1.0, 0.0),
        ]
        feats = _features(spark, rows, peak_axis="acc_y")[1]
        assert feats["avg_time_peak"] == 0.0

    def test_sample_is_truncated_before_compare(self, spark):
        # DataManager.java:22 truncation: sample 9.95 -> 9, max 10.0 ->
        # threshold 9.0; 9 > 9.0 is FALSE, so 9.95 is not a peak even
        # though its double value exceeds the threshold.
        rows = [
            (1, 1, 0.0, 10.0, 0.0),
            (1, 2, 0.0, 9.95, 0.0),
            (1, 3, 0.0, 10.0, 0.0),
        ]
        feats = _features(spark, rows, peak_axis="acc_y")[1]
        # peaks at ts 1 and 3 only -> delta 2
        assert feats["avg_time_peak"] == pytest.approx(2.0)


def test_single_row_group_var_null(spark):
    """var_samp of a 1-row group is NULL (documented divergence from
    MLlib's 0.0; callers gate or coalesce — ml/models.py fills 0.0)."""
    feats = _features(spark, [(1, 0, 1.0, 2.0, 3.0)])[1]
    assert feats["var_x"] is None
    assert feats["n_samples"] == 1
