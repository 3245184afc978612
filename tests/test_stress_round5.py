"""Adversarial-shape stress tests for the round-5 operators: hot keys,
degenerate bounds, and skewed graphs — the inputs the synthetic
testdata is too uniform to produce."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from activity_classifier_spark_cassandra_spark.operators import graph as G
from activity_classifier_spark_cassandra_spark.operators import manifest as MF
from activity_classifier_spark_cassandra_spark.operators import spans as SP


def test_span_dedup_hot_gram_across_all_docs(spark):
    """One 5-gram shared by EVERY doc: the gh-window partition holds
    all positions (worst-case skew) and every doc must be reported
    with exactly that span covered."""
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"u{i} {shared} v{i}") for i in range(50)]
    )
    out = SP.span_dedup_report(docs, n=5).collect()
    assert len(out) == 50
    assert all(r["dup_spans"] == 1 and r["dup_tokens"] == 5 for r in out)


def test_pagerank_star_graph_hub_dominates(spark):
    """Star: hub 0 <-> spokes 1..20.  The hub must outrank every
    spoke, and the exact fixed-point values must match the sequential
    replay (deg(hub)=20, deg(spoke)=1)."""
    spokes = list(range(1, 21))
    pairs = [(0, s) for s in spokes] + [(s, 0) for s in spokes]
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(edges, iters=3).collect()
    }
    S, D = G.PR_SCALE, G.PR_DAMPING_PCT
    tele = (100 - D) * S // 100
    rank = {n: S for n in range(21)}
    for _ in range(3):
        hub_in = sum(rank[s] // 1 for s in spokes)
        spoke_in = rank[0] // 20
        nxt = {0: tele + (D * hub_in) // 100}
        for s in spokes:
            nxt[s] = tele + (D * spoke_in) // 100
        rank = nxt
    assert got == rank
    assert all(got[0] > got[s] for s in spokes)


def test_manifest_constant_timestamp_hits_empty_prune(spark, tmp_path):
    """All events at ONE instant: lo == hi makes the middle-third
    window [a, b) empty, prune keeps zero files, and the fallback path
    must return an empty frame instead of crashing on a zero-path
    read."""
    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=i % 3,
                event_type="view",
                value=1.0,
                props="{}",
            )
            for i in range(30)
        ]
    )
    out = str(tmp_path / "const")
    ev.write.mode("overwrite").parquet(out + "/events.parquet")
    result, kept, total = MF.pruned_range_agg(spark, out)
    assert kept == 0 and total >= 1
    assert result.count() == 0


def test_user_trend_hand_computed_line(spark, tmp_path):
    """Events exactly on y = 3 + 2·day must recover slope 2 and
    intercept 3; a one-day user must get NULL slope (zero x-variance);
    single-event users are filtered."""
    import datetime

    from activity_classifier_spark_cassandra_spark.operators.timeseries import (
        q_user_trend,
    )

    def ev(i, user, day, value):
        return Row(
            event_id=i,
            ts=datetime.datetime(2024, 1, 1 + day),
            user_id=user,
            event_type="m",
            value=float(value),
            props="{}",
        )

    rows = [ev(i, 1, d, 3 + 2 * d) for i, d in enumerate([0, 1, 2, 3])]
    rows += [ev(10 + i, 2, 1, 5.0) for i in range(3)]  # one day only
    rows += [ev(20, 3, 2, 9.0)]  # single event -> filtered
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "trend")
    df.write.mode("overwrite").parquet(out + "/events.parquet")
    got = {
        r["user_id"]: (r["slope_per_day"], r["intercept"], r["n_events"])
        for r in q_user_trend(spark, out).collect()
    }
    assert got[1] == (2.0, 3.0, 4)
    assert got[2] == (None, None, 3)
    assert 3 not in got
