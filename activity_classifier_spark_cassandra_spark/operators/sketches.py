"""Probabilistic structures for 100 TB pipelines: count-min heavy
hitters and Bloom-filter join pruning (semi-join reduction).

Both use a *deterministic, engine-portable* hash — the first 15 hex
chars of ``md5(seed || '|' || key)`` parsed as a 60-bit integer — so
DuckDB oracles can replay the exact sketch, not just bound it.  (Spark
``xxhash64`` has no DuckDB twin; md5 does.)

Count-min (Cormode & Muthukrishnan 2005): R seeded hash rows × W
buckets of counts; ``est(k) = min_r cell[r, h_r(k) % W]``.  The cell
build is one exploded groupBy (R rows per input row), the estimate
side joins the tiny R×W cell table broadcast — the 100 TB shape is
"one scan + one small broadcast", never a per-key shuffle of raw rows.

Bloom join pruning mirrors what Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects for
shuffle joins, made explicit as an operator: build an M-bit / K-hash
filter from the small side's join keys as ~M/64 (word, mask) rows,
broadcast it, and drop probe-side rows whose K bits aren't all set
*before* the shuffle join.  False positives only cost work — the exact
join behind the filter keeps results identical to the plain join,
which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ------------------------------------------------------ shared hash
CMS_ROWS = 4
CMS_WIDTH = 512
BLOOM_BITS = 1 << 20  # 16384 longs ≈ 128 KiB broadcast
BLOOM_HASHES = 3


def _hash60(col: Column, seed: int) -> Column:
    """60-bit integer from md5 — identical in Spark and DuckDB."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def _hash60_sql(expr: str, seed: int) -> str:
    return (
        f"CAST(concat('0x', substring(md5(concat('{seed}', '|', "
        f"CAST({expr} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


def _hash60_spark_sql(expr: str, seed: int) -> str:
    """Spark-SQL-string twin of _hash60 (conv(), not the DuckDB '0x'
    cast) for use inside higher-order-function lambdas where a Column
    can't reach.  The THREE spellings of the shared 60-bit md5 recipe
    live side by side here on purpose — see _cms_coords: drift between
    any two of them breaks a cross-engine guarantee."""
    return (
        f"cast(conv(substring(md5(concat_ws('|', '{seed}', "
        f"cast({expr} as string))), 1, 15), 16, 10) as bigint)"
    )


# ------------------------------------------------- count-min sketch
def _cms_coords(col: Column) -> Column:
    """Exploded R (r, bucket) coordinate structs for a key column —
    the ONE definition both the cell build and the probe side use; a
    drift between them would break the est >= exact guarantee."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (_hash60(col, r) % CMS_WIDTH).alias("bucket"),
                )
                for r in range(CMS_ROWS)
            ]
        )
    )


def cms_cells(df: DataFrame, key: str) -> DataFrame:
    """The R×W count-min cell table (≤ CMS_ROWS·CMS_WIDTH rows).

    One pass over the input: each row explodes to its R (row, bucket)
    coordinates, then a single groupBy counts per cell.  Map-side
    partial aggregation collapses each task's contribution to ≤ R·W
    rows before the (tiny) shuffle.
    """
    return (
        df.select(_cms_coords(F.col(key)).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )


def cms_heavy_hitters(df: DataFrame, key: str) -> DataFrame:
    """Keys whose count-min estimate exceeds ~1.05× the mean key
    frequency, with the exact count alongside for overcount audit.

    The candidate side here is the exact per-key count table (we have
    it anyway for the audit); at true scale the same estimate join
    works against any candidate stream without exact counts — the
    sketch is the scan, candidates are whatever you probe with.
    Output: key, exact_cnt, cms_est, overcount (≥0 by construction),
    within_eps (CMS guarantee: overcount ≤ e/W · N, pr 1−e^-R).
    """
    cells = cms_cells(df, key)
    exact = df.groupBy(key).agg(F.count(F.lit(1)).alias("exact_cnt"))
    totals = df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(key).alias("n_keys"),
    )

    probes = exact.select(
        key, "exact_cnt", _cms_coords(F.col(key)).alias("c")
    ).select(key, "exact_cnt", "c.r", "c.bucket")

    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(key, "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
    eps_bound = F.ceil(F.lit(2.718281828459045 / CMS_WIDTH) * F.col("n_total"))
    return (
        est.crossJoin(F.broadcast(totals))
        .where(
            F.col("cms_est") * F.col("n_keys") >= F.lit(1.05) * F.col("n_total")
        )
        .select(
            key,
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
            (F.col("cms_est") - F.col("exact_cnt") <= eps_bound).alias(
                "within_eps"
            ),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col(key).asc())
    )


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy event users via count-min — the sketch-side answer to
    q_key_skew_profile's exact one."""
    from ..sources.io import load_table

    return cms_heavy_hitters(load_table(spark, sf_dir, "events"), "user_id")


def _cms_coords_sql(expr: str) -> str:
    """R (r, bucket) structs for a key expression, DuckDB-side."""
    pairs = ", ".join(
        f"{{'r': {r}, 'bucket': {_hash60_sql(expr, r)} % {CMS_WIDTH}}}"
        for r in range(CMS_ROWS)
    )
    return f"[{pairs}]"


HEAVY_HITTERS_CMS_SQL = f"""
WITH coords AS (
  SELECT UNNEST({_cms_coords_sql('user_id')},
                recursive := true)
  FROM events
),
cells AS (
  SELECT r, bucket, COUNT(*) AS cell_cnt FROM coords GROUP BY r, bucket
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
),
totals AS (
  SELECT COUNT(*) AS n_total, COUNT(DISTINCT user_id) AS n_keys FROM events
),
probes AS (
  SELECT user_id, exact_cnt,
         UNNEST({_cms_coords_sql('user_id')},
                recursive := true)
  FROM exact
),
est AS (
  SELECT p.user_id, p.exact_cnt, MIN(c.cell_cnt) AS cms_est
  FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
  GROUP BY p.user_id, p.exact_cnt
)
SELECT user_id, exact_cnt, cms_est,
       cms_est - exact_cnt AS overcount,
       cms_est - exact_cnt
         <= CEIL(2.718281828459045 / {CMS_WIDTH} * n_total) AS within_eps
FROM est CROSS JOIN totals
WHERE cms_est * n_keys >= 1.05 * n_total
ORDER BY exact_cnt DESC, user_id ASC
"""


# ---------------------------------------------- bloom join pruning
def bloom_build(keys: DataFrame, key: str) -> DataFrame:
    """(word, mask) rows of an M-bit Bloom filter over ``keys[key]``
    — at most M/64 rows regardless of key count, built with one
    exploded groupBy + bit_or (map-side combinable)."""
    coords = F.explode(
        F.array(
            *[
                (_hash60(F.col(key), 100 + s) % BLOOM_BITS).alias(f"p{s}")
                for s in range(BLOOM_HASHES)
            ]
        )
    )
    return (
        keys.select(coords.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )


def bloom_prune(probe: DataFrame, key: str, bloom: DataFrame) -> DataFrame:
    """Drop probe rows whose K bloom bits aren't all set.

    K broadcast hash joins against the ≤ M/64-row filter table — no
    explode of the probe side (a 100 TB fact must not be tripled), no
    shuffle, and the filter composes with whole-stage codegen.  May
    keep false positives; never drops a true match.
    """
    out = probe
    for s in range(BLOOM_HASHES):
        pos = _hash60(F.col(key), 100 + s) % BLOOM_BITS
        out = out.withColumn(f"_w{s}", (pos / 64).cast("long")).withColumn(
            f"_b{s}", (pos % 64).cast("int")
        )
        side = F.broadcast(
            bloom.select(
                F.col("word").alias(f"_w{s}"), F.col("mask").alias(f"_m{s}")
            )
        )
        out = out.join(side, f"_w{s}", "left")
    cond = None
    for s in range(BLOOM_HASHES):
        hit = F.expr(
            f"coalesce(_m{s} & shiftleft(CAST(1 AS BIGINT), _b{s}), "
            f"CAST(0 AS BIGINT)) != 0"
        )
        cond = hit if cond is None else cond & hit
    return out.where(cond).drop(
        *[c for s in range(BLOOM_HASHES) for c in (f"_w{s}", f"_b{s}", f"_m{s}")]
    )


def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue: lineitem is bloom-pruned on l_orderkey
    against the filtered orders side before the exact join, so at
    scale only ~|urgent| of the fact's rows reach the shuffle.
    Result is identical to the plain join (oracle-checked)."""
    from ..sources.io import load_table

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", bloom)
    return (
        pruned.join(
            orders.select("o_orderkey", "o_totalprice"),
            pruned["l_orderkey"] == orders["o_orderkey"],
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                6,
            ).alias("revenue"),
        )
        .orderBy("o_orderkey")
    )


BLOOM_JOIN_PRUNE_SQL = """
SELECT o.o_orderkey, o.o_totalprice,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_quantity), 6) AS sum_qty,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderkey, o.o_totalprice
ORDER BY o.o_orderkey
"""
