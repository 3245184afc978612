"""Z-order layout: Morton-code bit math, write-side clustering, and
the file-skipping payoff (per-file envelopes narrower than a
single-column sort gives the second dimension)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import layout as LY

SF_DIR = "/root/testdata/sf0.001"


def test_morton_interleave_known_values(spark):
    # domain 0..3 normalizes to the top 2 of the 16 bits; check the
    # interleave itself on an identity domain [0, 2^16)
    df = spark.createDataFrame(
        [Row(x=x, y=y) for x, y in [(0, 0), (1, 0), (0, 1), (3, 3), (5, 2)]]
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", F.expr(LY._interleave("x", "y")).alias("z")
        ).collect()
    }
    # z = sum over bits: x -> even positions, y -> odd
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(3, 3)] == 15
    assert out[(5, 2)] == 0b011001  # x=101 -> 1_0_1, y=010 -> _1_0_ => 011001


def test_zorder_buckets_partition_all_rows(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = LY.zorder_layout_stats(li, "l_partkey", "l_suppkey").toPandas()
    assert out["n_rows"].sum() == li.count()
    assert out["z_bucket"].between(0, 7).all()


def test_zorder_shrinks_both_spans(spark):
    """Every z-bucket's envelope must be strictly narrower than the
    global domain in BOTH dimensions — the property a sort by
    l_partkey alone cannot give l_suppkey."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = LY.zorder_layout_stats(li, "l_partkey", "l_suppkey").toPandas()
    g1 = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("s")
    ).collect()[0]["s"]
    g2 = li.agg(
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("s")
    ).collect()[0]["s"]
    # top-3-bit bucketing splits y twice and x once: y span <= ~1/4
    # of global, x span <= ~1/2 (+1 slack for integer edges)
    assert (out["span1"] <= g1 / 2 + 1).all()
    assert (out["span2"] <= g2 / 4 + 1).all()


def test_zorder_write_clusters_files(spark, tmp_path):
    """Round-trip through zorder_write: per-file envelopes from the
    actual parquet layout must beat the unclustered write's for the
    second dimension on average."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    zpath = str(tmp_path / "z")
    LY.zorder_write(li, "l_partkey", "l_suppkey", zpath, n_files=8)

    def file_spans(path):
        df = spark.read.parquet(path)
        return (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("s1"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("s2"),
            )
            .toPandas()
        )

    z = file_spans(zpath)
    assert spark.read.parquet(zpath).count() == li.count()
    lo, hi = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    g2 = hi - lo
    # unclustered single-file baseline would have span == g2; the
    # z-ordered files must average well under it
    assert z["s2"].mean() < g2 * 0.6
