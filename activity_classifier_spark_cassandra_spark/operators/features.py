"""Per-window statistical feature extraction (A3-A8 + P6/P7/P9,
SURVEY.md §2.4-2.5) — the flagship aggregation.

The reference computes these 11 features with ~9 separate Spark jobs
**per window** driven from a driver loop (job/RecognizeActivity.java:94-117,
data/ExtractFeature.java), each funneling through
``Statistics.colStats`` (a treeAggregate).  Spark-first: ONE
``groupBy(group_cols).agg(...)`` over the whole table — partial
aggregation map-side, a single hash exchange, whole-stage codegen,
no Python in the plan.

Semantic parity points (all pinned by tests/test_features.py):
- variance is **unbiased sample variance** (n-1): MLlib's
  MultivariateOnlineSummarizer divides by n-1 (A4) -> ``F.var_samp``.
- mean-abs-deviation is two-pass — deviation from the group mean
  (data/ExtractFeature.java:53-65) -> windowed mean, then avg(abs(v-m)).
- resultant = mean of sqrt(sum of squares over axes)
  (data/ExtractFeature.java:70-82).
- peak timing on one axis, with the sample **truncated to long first**
  (data/DataManager.java:22): peaks are rows with v_long > 0.9 * max
  (data/ExtractFeature.java:93), deltas between consecutive peak
  timestamps, non-positive deltas dropped (:108, dedups equal
  timestamps), mean; 0.0 when fewer than 2 peaks (:97,115).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def extract_features(
    df: DataFrame,
    group_cols: Sequence[str],
    axes: Mapping[str, str],
    ts_col: str = "timestamp",
    peak_axis: str | None = None,
    tiebreak: Sequence[str] = (),
    two_pass_var: bool = False,
) -> DataFrame:
    """One row per group: n_samples + {mean, var, avg_abs_diff} per
    axis + resultant + avg_time_peak.

    ``axes`` maps output suffix -> input column, e.g.
    ``{"x": "acc_x", "y": "acc_y", "z": "acc_z"}``.  ``peak_axis`` is
    the *input column* used for peak timing (reference uses acc_y,
    job/RecognizeActivity.java:92); defaults to the last axis.

    The helper columns are window functions over the same partition
    keys as the final groupBy, so Catalyst plans exactly one exchange:
    the window's hash partitioning satisfies the aggregation's
    clustering requirement.
    """
    axes = dict(axes)
    peak_axis = peak_axis or list(axes.values())[-1]

    part = Window.partitionBy(*group_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    ow = Window.partitionBy(*group_cols).orderBy(*order)

    d = df
    # two-pass mean-abs-deviation: group mean first (A6)
    for suffix, c in axes.items():
        d = d.withColumn(f"_mean_{suffix}", F.avg(c).over(part))
    # resultant magnitude per row (A7)
    sq_sum: Column = reduce(
        lambda a, b: a + b, [F.col(c) * F.col(c) for c in axes.values()]
    )
    d = d.withColumn("_resultant", F.sqrt(sq_sum))

    # peak detection (P6/P9): the *sample* is truncated to long
    # (data/DataManager.java:22) but the max it is compared against is
    # the UNtruncated double (the colStats summary is built over double
    # vectors, job/RecognizeActivity.java:96-101; threshold at
    # data/ExtractFeature.java:90-93) — a long in (0.9*floor(max),
    # 0.9*max] is NOT a peak.
    d = d.withColumn("_peak_v", F.col(peak_axis).cast("long"))
    d = d.withColumn("_peak_max", F.max(F.col(peak_axis)).over(part))
    d = d.withColumn(
        "_peak_ts",
        F.when(F.col("_peak_v") > 0.9 * F.col("_peak_max"), F.col(ts_col)),
    )
    prev_peak = F.last("_peak_ts", ignorenulls=True).over(
        ow.rowsBetween(Window.unboundedPreceding, -1)
    )
    # delta between consecutive peaks; non-positive dropped (P7)
    d = d.withColumn(
        "_peak_delta",
        F.when(
            F.col("_peak_ts").isNotNull()
            & ((F.col("_peak_ts") - prev_peak) > 0),
            (F.col("_peak_ts") - prev_peak).cast("double"),
        ),
    )

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_samples")]
    for suffix, c in axes.items():
        aggs.append(F.avg(c).alias(f"mean_{suffix}"))
    for suffix, c in axes.items():
        # var_samp yields NULL for single-row groups in both Spark and
        # ANSI SQL; MLlib would yield 0.0 — callers gate on n_samples.
        if two_pass_var:
            # Explicit two-pass sample variance from the group mean the
            # plan already materialized: engines disagree in the last
            # few ulps of their single-pass var_samp on mean-shifted
            # data, while SUM of centered squares is well-conditioned
            # and bit-reproducible across Spark and the DuckDB oracle.
            dev = F.col(c) - F.col(f"_mean_{suffix}")
            aggs.append(
                (
                    F.sum(dev * dev)
                    / F.nullif(F.count(F.lit(1)) - 1, F.lit(0))
                ).alias(f"var_{suffix}")
            )
        else:
            aggs.append(F.var_samp(c).alias(f"var_{suffix}"))
    for suffix, c in axes.items():
        aggs.append(
            F.avg(F.abs(F.col(c) - F.col(f"_mean_{suffix}"))).alias(
                f"avg_abs_diff_{suffix}"
            )
        )
    aggs.append(F.avg("_resultant").alias("resultant"))
    aggs.append(
        F.coalesce(F.avg("_peak_delta"), F.lit(0.0)).alias("avg_time_peak")
    )

    return d.groupBy(*group_cols).agg(*aggs)
