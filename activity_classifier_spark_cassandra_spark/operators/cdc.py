"""Change-data-capture compaction: latest-version-wins upsert as a pure
DataFrame plan.

Lakehouse engines expose this as MERGE INTO; on plain parquet the
equivalent nightly job is: union(base, updates) → keep the
highest-version record per key → rewrite.  That is one shuffle on the
key (window or groupBy — both hash-partition by key) regardless of how
many update batches piled up, and it's the shape every 100 TB ingest
pipeline runs to stop small update files from eating read performance.

The registered query builds a deterministic update set from the base
table itself (a key-stable 10% of orders get a corrected price and
version 1), compacts, and summarizes — so the oracle can reproduce it
bit-for-bit with SQL window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def upsert_compact(
    base: DataFrame, updates: DataFrame, keys: list[str], version_col: str
) -> DataFrame:
    """Latest-wins compaction: one row per key, the one with the highest
    (version, …keys) — deterministic because version ties are broken by
    preferring the update side only if versions genuinely differ (equal
    versions would be an ingest bug; row_number makes the pick stable
    via the version ordering alone)."""
    unioned = base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact base orders + a key-stable 10% update batch (price
    corrected +100, version 1), then summarize per status — count and
    price sum shift only if exactly the updated keys won."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "version", F.lit(0)
    )
    updates = (
        orders.filter(
            F.md5(F.col("o_orderkey").cast("string")) < "19999999"
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .withColumn("version", F.lit(1))
    )
    merged = upsert_compact(
        orders, updates, keys=["o_orderkey"], version_col="version"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.sum("version").alias("n_updated"),
    )


UPSERT_COMPACT_SQL = """
WITH base AS (
  SELECT *, 0 AS version FROM orders
),
updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100.0
           AS o_totalprice, o_orderdate, o_orderpriority, 1 AS version
  FROM orders
  WHERE md5(CAST(o_orderkey AS VARCHAR)) < '19999999'
),
merged AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL BY NAME SELECT * FROM updates)
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       CAST(SUM(version) AS BIGINT) AS n_updated
FROM merged WHERE rn = 1
GROUP BY o_orderstatus
"""
