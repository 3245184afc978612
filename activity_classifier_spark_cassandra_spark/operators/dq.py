"""Data-quality audit: the constraint checks a warehouse runs before
admitting a batch — referential integrity, key uniqueness, domain
ranges, nullness, and cross-column ordering — emitted as one
(check_name, n_violations, n_checked) row per rule.

Shape: each relational check is a narrow aggregate over a pruned scan
(violation predicates fold into one pass per table); the referential
checks are anti joins on the key — the same exchange a production
FK-validation job pays.  Everything unions into one tiny result.
At 100 TB each check reads only the columns it names (column pruning),
and the two anti joins are the only shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def agg_check(name: str, df: DataFrame, pred) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.sum(F.when(pred, 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    # referential integrity, both directions (anti joins on the key)
    li_orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("lineitem_orphans").alias("check_name"),
            "n_violations",
        )
        .crossJoin(
            lineitem.agg(F.count(F.lit(1)).alias("n_checked"))
        )
    )
    childless = (
        orders.select("o_orderkey")
        .join(
            lineitem.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("orders_childless").alias("check_name"), "n_violations"
        )
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_checked")))
    )
    # key uniqueness: rows minus distinct keys
    cust_dups = customer.agg(
        F.lit("customer_dup_keys").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
        .cast("long")
        .alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    )
    # single-pass predicate checks
    checks = [
        agg_check(
            "orders_nonpositive_price",
            orders,
            F.col("o_totalprice") <= 0,
        ),
        agg_check(
            "orders_blank_status",
            orders,
            F.col("o_orderstatus").isNull()
            | (F.col("o_orderstatus") == ""),
        ),
        agg_check(
            "lineitem_qty_out_of_range",
            lineitem,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        agg_check(
            "lineitem_discount_range",
            lineitem,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
        ),
        li_orphans,
        childless,
        cust_dups,
    ]
    return reduce(DataFrame.unionByName, checks)


DQ_AUDIT_SQL = """
SELECT 'orders_nonpositive_price' AS check_name,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       COUNT(*) AS n_checked
FROM orders
UNION ALL
SELECT 'orders_blank_status',
       CAST(SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus = ''
                     THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'lineitem_qty_out_of_range',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                     THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5
                     THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM lineitem
UNION ALL
SELECT 'lineitem_orphans',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_childless',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey)),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'customer_dup_keys',
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT),
       COUNT(*)
FROM customer
"""


# ------------------------------------------------- distribution drift
#
# Population Stability Index between the older and newer half of the
# events timeline, per event_type — the train/serve skew monitor every
# production feature pipeline runs before promoting a model.  The
# timeline split point and the per-type bin edges are computed IN the
# plan (integer epoch midpoint; reference-half min/max), so the query
# is fully self-contained and deterministic.
#
# Output is PER-BIN (event_type, bin, n_ref, n_cur, p_ref, p_cur,
# psi_contrib) rather than a per-type PSI total: the contributions are
# irrational (ln), and a cross-row float SUM merges in partition order
# — emitting the bin rows keeps every value an exact function of
# integer counts, hence hash-stable across engines; the consumer sums
# 10 rounded numbers.  Laplace +1 smoothing removes ln(0)/div-0 without
# an epsilon constant both engines would have to share.
#
# Scale shape: one pruned scan -> 1-row global bounds broadcast ->
# per-type reference min/max (combinable agg, tiny) broadcast back ->
# one (event_type, bin) count groupBy (combinable) -> per-type totals
# via a second tiny agg joined broadcast.  The events table crosses
# the wire once, as (type, bin) partial counts.

PSI_BINS = 10


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.io import ts_ms

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type", ts_ms(ev).alias("ms"), F.col("value").cast("double")
    )
    bounds = e.agg(
        ((F.min("ms") + F.max("ms")) / F.lit(2)).cast("long").alias("mid")
    )
    d = e.crossJoin(F.broadcast(bounds)).withColumn(
        "is_ref", F.col("ms") < F.col("mid")
    )
    ref_range = (
        d.filter("is_ref")
        .groupBy("event_type")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(PSI_BINS))
    binned = (
        d.join(F.broadcast(ref_range), "event_type")
        .withColumn(
            "bin",
            # degenerate guard: a constant-valued reference half gives
            # width 0 → NaN/Inf through floor; Spark would coerce it to
            # a bin while the DuckDB oracle's CAST(FLOOR(inf) AS INT)
            # raises — pin the whole type to bin 0 in BOTH engines
            F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
                F.least(
                    F.lit(PSI_BINS - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col("value") - F.col("vmin")) / width
                        ).cast("int"),
                    ),
                )
            ),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    totals = binned.groupBy("event_type").agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    p_ref = (F.col("n_ref") + 1) / (F.col("tot_ref") + PSI_BINS)
    p_cur = (F.col("n_cur") + 1) / (F.col("tot_cur") + PSI_BINS)
    return (
        binned.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            F.col("bin").cast("long").alias("bin"),
            "n_ref",
            "n_cur",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_contrib"
            ),
        )
    )


DRIFT_PSI_SQL = f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ms, CAST(value AS DOUBLE) AS value
  FROM events
),
bounds AS (
  -- FLOOR before the cast: DuckDB CAST(double AS BIGINT) ROUNDS while
  -- Spark's .cast("long") truncates — an odd min+max would shift the
  -- split point by 1 ms between engines without it
  SELECT CAST(FLOOR((MIN(ms) + MAX(ms)) / 2) AS BIGINT) AS mid FROM e
),
d AS (
  SELECT e.*, e.ms < b.mid AS is_ref FROM e CROSS JOIN bounds b
),
ref_range AS (
  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
  FROM d WHERE is_ref GROUP BY event_type
),
binned AS (
  SELECT d.event_type,
    -- width-0 guard mirrored from the Spark expression: constant
    -- reference half → everything in bin 0 (no Inf through FLOOR)
    CASE WHEN r.vmax = r.vmin THEN 0 ELSE
      LEAST({PSI_BINS - 1}, GREATEST(0,
        CAST(FLOOR((d.value - r.vmin)
                   / ((r.vmax - r.vmin) / {float(PSI_BINS)})) AS INT)))
    END AS bin,
    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM d JOIN ref_range r ON r.event_type = d.event_type
  GROUP BY 1, 2
),
totals AS (
  SELECT event_type, SUM(n_ref) AS tot_ref, SUM(n_cur) AS tot_cur
  FROM binned GROUP BY event_type
)
SELECT b.event_type, CAST(b.bin AS BIGINT) AS bin,
  CAST(b.n_ref AS BIGINT) AS n_ref, CAST(b.n_cur AS BIGINT) AS n_cur,
  ROUND((b.n_ref + 1) / (t.tot_ref + {PSI_BINS}), 6) AS p_ref,
  ROUND((b.n_cur + 1) / (t.tot_cur + {PSI_BINS}), 6) AS p_cur,
  ROUND(((b.n_cur + 1) / (t.tot_cur + {PSI_BINS})
         - (b.n_ref + 1) / (t.tot_ref + {PSI_BINS}))
        * LN(((b.n_cur + 1) / (t.tot_cur + {PSI_BINS}))
             / ((b.n_ref + 1) / (t.tot_ref + {PSI_BINS}))), 6)
    AS psi_contrib
FROM binned b JOIN totals t ON t.event_type = b.event_type
"""
