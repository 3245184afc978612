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
