"""Randomized cross-check: extract_features vs an independent pure
numpy/python re-implementation of the reference semantics, over 200
seeded random groups in one Spark job.  Catches any drift in
var_samp / two-pass absdev / resultant / peak logic that fixed
fixtures might miss."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.operators.features import (
    extract_features,
)

SCHEMA = T.StructType(
    [
        T.StructField("g", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("acc_y", T.DoubleType()),
    ]
)


def _reference_features(ts, ys):
    """Pure-python reference implementation (mirrors
    data/ExtractFeature.java semantics independently of Spark)."""
    n = len(ys)
    mean = sum(ys) / n
    var = sum((y - mean) ** 2 for y in ys) / (n - 1) if n > 1 else None
    absdev = sum(abs(y - mean) for y in ys) / n
    resultant = sum(math.sqrt(y * y) for y in ys) / n
    # peak logic: truncated sample vs 0.9 * untruncated max
    mx = max(ys)
    peaks = [t for t, y in sorted(zip(ts, ys)) if int(y) > 0.9 * mx]
    deltas = [b - a for a, b in zip(peaks, peaks[1:]) if b - a > 0]
    avg_peak = sum(deltas) / len(deltas) if deltas else 0.0
    return mean, var, absdev, resultant, avg_peak


@pytest.fixture(scope="module")
def random_groups():
    rng = np.random.default_rng(20260813)
    groups = {}
    rows = []
    for g in range(200):
        n = int(rng.integers(1, 40))
        ts = sorted(
            int(t) for t in rng.choice(100_000, size=n, replace=False)
        )
        ys = [float(round(v, 3)) for v in rng.normal(10, 8, size=n)]
        groups[g] = (ts, ys)
        rows += [(g, t, y) for t, y in zip(ts, ys)]
    return groups, rows


def test_matches_numpy_reference(spark, random_groups):
    groups, rows = random_groups
    df = spark.createDataFrame(rows, schema=SCHEMA)
    out = extract_features(
        df, group_cols=["g"], axes={"y": "acc_y"}, ts_col="timestamp"
    )
    got = {r["g"]: r.asDict() for r in out.collect()}
    assert len(got) == len(groups)
    for g, (ts, ys) in groups.items():
        mean, var, absdev, resultant, avg_peak = _reference_features(ts, ys)
        r = got[g]
        assert r["mean_y"] == pytest.approx(mean, rel=1e-9), g
        if var is None:
            assert r["var_y"] is None, g
        else:
            assert r["var_y"] == pytest.approx(var, rel=1e-9), g
        assert r["avg_abs_diff_y"] == pytest.approx(absdev, rel=1e-9), g
        assert r["resultant"] == pytest.approx(resultant, rel=1e-9), g
        assert r["avg_time_peak"] == pytest.approx(avg_peak, rel=1e-9), g
