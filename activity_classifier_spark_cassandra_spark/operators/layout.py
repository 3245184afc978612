"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

Parquet/Iceberg/Delta scans prune row groups with per-file min/max
stats, but stats only help on columns the data is clustered by.
Sorting by (a, b) clusters a perfectly and b not at all; interleaving
the bits of both keys (the Z-order curve) gives every prefix of the
curve a bounded rectangle in (a, b) space, so range predicates on
EITHER column skip most files.  This is the layout trick behind
Delta's OPTIMIZE ZORDER BY, expressed here with plain DataFrame ops:

  zorder_value  — pure-expression 32-bit Morton code (JVM codegen,
                  no UDF), domain-normalized via broadcast min/max;
  zorder_write  — repartitionByRange(z) + sortWithinPartitions(z)
                  + parquet write: a distributed range sort, the only
                  shuffle, sized by n_files;
  q_zorder_layout — the auditable demo: bucket rows by the top 3 bits
                  of z (a deterministic stand-in for file boundaries —
                  range-partitioner sampling is seed-dependent, top-bit
                  bucketing is not) and report each bucket's min/max
                  envelope per dimension.  The envelopes are the
                  file-skipping stats a reader would prune with; the
                  DuckDB oracle replays the same bit math exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per dimension; z fits in 32 bits


def _normalize(col: str, lo: str, hi: str) -> str:
    """Scale a key into [0, 2^Z_BITS) by its broadcast min/max.

    Integer DIV end-to-end: `/` is double division in Spark SQL, and a
    double->bigint CAST truncates in Spark but ROUNDS in DuckDB — an
    oracle-visible off-by-one on every odd bucket boundary."""
    return (
        f"(CAST({col} - {lo} AS BIGINT) * {1 << Z_BITS}) "
        f"DIV ({hi} - {lo} + 1)"
    )


def _spread(v: str) -> str:
    """Insert a zero bit between each of the low Z_BITS bits of ``v``
    — the closed-form magic-mask cascade (4 shift/or/mask steps), not
    a per-row array lambda: at 100 TB the interleave runs on every
    row, so it must stay inside whole-stage codegen as plain integer
    ops."""
    s = f"CAST({v} AS BIGINT)"
    for shift, mask in [
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ]:
        s = f"(({s} | shiftleft({s}, {shift})) & {mask})"
    return s


def _interleave(x: str, y: str) -> str:
    """Morton-interleave two Z_BITS-wide ints (x gets even bits)."""
    return f"({_spread(x)} | shiftleft({_spread(y)}, 1))"


def zorder_value(df: DataFrame, c1: str, c2: str) -> DataFrame:
    """Append the Morton code of (c1, c2) as ``zval``.

    The min/max normalization constants come from one tiny aggregate
    broadcast against the scan — at 100 TB that is catalog-stats
    cheap, and keeping normalization ORDER-preserving (not hashed) is
    what preserves the clustering property.
    """
    bounds = df.agg(
        F.min(c1).alias("_lo1"),
        F.max(c1).alias("_hi1"),
        F.min(c2).alias("_lo2"),
        F.max(c2).alias("_hi2"),
    )
    nx = _normalize(c1, "_lo1", "_hi1")
    ny = _normalize(c2, "_lo2", "_hi2")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("zval", F.expr(_interleave(nx, ny)))
        .drop("_lo1", "_hi1", "_lo2", "_hi2")
    )


def zorder_write(
    df: DataFrame, c1: str, c2: str, path: str, n_files: int = 8
) -> None:
    """Cluster-and-write: one distributed range sort on the Morton
    code, one file per range — the write-side OPTIMIZE ZORDER."""
    (
        zorder_value(df, c1, c2)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


N_Z_BUCKETS_LOG2 = 3  # 8 deterministic "files"


def zorder_layout_stats(df: DataFrame, c1: str, c2: str) -> DataFrame:
    """Per-z-bucket min/max envelopes for both clustering dimensions.

    Each bucket's (span1 × span2) rectangle is what a stats-pruning
    reader needs to overlap to touch that bucket; z-ordering shrinks
    both spans to ~bucket_share of the domain simultaneously, which a
    single-column sort cannot do for the second column.
    """
    shift = 2 * Z_BITS - N_Z_BUCKETS_LOG2
    return (
        zorder_value(df, c1, c2)
        .select(F.expr(f"shiftright(zval, {shift})").alias("z_bucket"), c1, c2)
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(c1).alias("min1"),
            F.max(c1).alias("max1"),
            F.min(c2).alias("min2"),
            F.max(c2).alias("max2"),
        )
        .select(
            "z_bucket",
            "n_rows",
            "min1",
            "max1",
            "min2",
            "max2",
            (F.col("max1") - F.col("min1")).alias("span1"),
            (F.col("max2") - F.col("min2")).alias("span2"),
        )
        .orderBy("z_bucket")
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem by (l_partkey, l_suppkey) and audit the
    per-bucket skipping envelopes."""
    from ..sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return zorder_layout_stats(li, "l_partkey", "l_suppkey")


def _interleave_sql(x: str, y: str) -> str:
    return (
        f"list_sum(list_transform(range(0, {Z_BITS}), i -> "
        f"((({x} >> i) & 1) << (2 * i)) + ((({y} >> i) & 1) << (2 * i + 1))))"
    )


_NX = f"((l_partkey - lo1) * {1 << Z_BITS}) // (hi1 - lo1 + 1)"
_NY = f"((l_suppkey - lo2) * {1 << Z_BITS}) // (hi2 - lo2 + 1)"

ZORDER_LAYOUT_SQL = f"""
WITH bounds AS (
  SELECT MIN(l_partkey) AS lo1, MAX(l_partkey) AS hi1,
         MIN(l_suppkey) AS lo2, MAX(l_suppkey) AS hi2
  FROM lineitem
),
z AS (
  SELECT CAST({_interleave_sql(_NX, _NY)} AS BIGINT)
           >> {2 * Z_BITS - N_Z_BUCKETS_LOG2} AS z_bucket,
         l_partkey, l_suppkey
  FROM lineitem CROSS JOIN bounds
)
SELECT z_bucket, COUNT(*) AS n_rows,
       MIN(l_partkey) AS min1, MAX(l_partkey) AS max1,
       MIN(l_suppkey) AS min2, MAX(l_suppkey) AS max2,
       MAX(l_partkey) - MIN(l_partkey) AS span1,
       MAX(l_suppkey) - MIN(l_suppkey) AS span2
FROM z
GROUP BY z_bucket
ORDER BY z_bucket
"""
