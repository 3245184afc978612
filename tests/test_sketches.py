"""Count-min heavy hitters and Bloom join pruning: sketch guarantees
(no undercount / no false negatives), pruning selectivity, and the
plan shape that keeps both scan-side at 100 TB."""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    # one hot key (600 rows), 50 cold keys (4 rows each)
    rows = [Row(k="hot") for _ in range(600)]
    rows += [Row(k=f"cold{i}") for i in range(50) for _ in range(4)]
    return spark.createDataFrame(rows)


# ------------------------------------------------------- count-min
def test_cms_never_undercounts(spark):
    """est(k) >= exact(k) for EVERY key — the one-sided CMS guarantee
    holds unconditionally, not just in expectation."""
    out = SK.cms_heavy_hitters(_skewed(spark), "k").toPandas()
    assert (out["cms_est"] >= out["exact_cnt"]).all()
    assert (out["overcount"] >= 0).all()


def test_cms_finds_the_hot_key(spark):
    out = SK.cms_heavy_hitters(_skewed(spark), "k").toPandas()
    assert "hot" in set(out["k"])
    hot = out[out["k"] == "hot"].iloc[0]
    assert hot["exact_cnt"] == 600
    # cold keys (4 << 1.05 * mean≈15.7) must not pass the gate unless
    # CMS collisions inflate them past it — with 51 keys in 512
    # buckets × 4 rows, min-of-rows makes that effectively impossible
    assert len(out) == 1


def test_cms_cell_table_is_bounded(spark):
    cells = SK.cms_cells(_skewed(spark), "k").toPandas()
    assert len(cells) <= SK.CMS_ROWS * SK.CMS_WIDTH
    # total mass: every input row lands in exactly one bucket per row
    assert cells.groupby("r")["cell_cnt"].sum().eq(800).all()


# ------------------------------------------------ bloom join prune
def test_bloom_prune_no_false_negatives(spark):
    """Every probe row whose key IS in the build set must survive."""
    keys = spark.createDataFrame([Row(k=i) for i in range(0, 1000, 7)])
    probe = spark.createDataFrame([Row(k=i, v=i * 2) for i in range(1000)])
    bloom = SK.bloom_build(keys, "k")
    kept = set(
        r["k"] for r in SK.bloom_prune(probe, "k", bloom).select("k").collect()
    )
    assert set(range(0, 1000, 7)) <= kept


def test_bloom_prune_selectivity(spark):
    """With M=2^20 bits and 143 keys the filter must reject nearly all
    of the 857 non-matching probe rows (fp rate ~(kn/m)^3 ≈ 1e-10)."""
    keys = spark.createDataFrame([Row(k=i) for i in range(0, 1000, 7)])
    probe = spark.createDataFrame([Row(k=i) for i in range(1000)])
    bloom = SK.bloom_build(keys, "k")
    n_kept = SK.bloom_prune(probe, "k", bloom).count()
    assert n_kept == 143  # exact: no false positive fits this fixture


def test_bloom_filter_table_is_bounded(spark):
    keys = spark.createDataFrame([Row(k=i) for i in range(5000)])
    words = SK.bloom_build(keys, "k").count()
    assert words <= SK.BLOOM_BITS // 64


def test_bloom_probe_plan_shape(spark):
    """The probe side takes K broadcast hash joins and no extra
    shuffle before the final join — the fact table is never exploded
    or repartitioned for membership testing."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_bloom_join_prune"](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= SK.BLOOM_HASHES
    assert "CartesianProduct" not in plan
    # the only Generates are the build side's position explode, which
    # the planner repeats once per probe join (identical broadcast
    # exchanges are deduped at runtime by ReusedExchange) — a probe/
    # fact-side explode would add a fourth
    assert len(re.findall(r"\(\d+\) Generate", plan)) == SK.BLOOM_HASHES


def test_bloom_pruned_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom = SK.bloom_build(orders.select("o_orderkey"), "o_orderkey")
    pruned = (
        SK.bloom_prune(li, "l_orderkey", bloom)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert pruned == plain
