"""Deterministic, key-stable sampling for training-data pipelines.

The reference splits train/test with a seeded randomSplit
(RecognizeActivity.java:134 — `randomSplit(new double[]{0.6, 0.4})`),
which is reproducible only within one job on one partitioning.  At
100 TB a pipeline needs splits that are stable across *runs, engines,
and repartitionings*: whether a row is train or test must be a pure
function of its key, so late-arriving data lands in the same side and
an eval set never leaks into training after a re-shard.

The standard trick: hash the key with a fixed digest (md5), compare the
hex prefix against a threshold.  p%% of keys satisfy
``md5(key) < hex(p * 2^32)`` because md5 is uniform over [0, 2^128).
Everything is a JVM-side built-in (no Python, no RNG state), filters
are pure row-predicates (no shuffle, full codegen), and DuckDB computes
the identical md5 — so every sample here is oracle-checkable, which a
``rand()``-based sample never is.

Scale notes: sampling is embarrassingly parallel (zero exchange);
keyed/stratified variants add only the aggregation the caller asked
for.  Per-user holdout uses a broadcast-able sampled-user set only
implicitly — the predicate is evaluated on the fact row itself, so no
join at all (contrast with sampling users then semi-joining, which
costs an exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def hash_bucket(key: Column) -> Column:
    """Lowercase 32-hex md5 of the key's canonical string form.
    Lexicographic order on the hex string == numeric order on the
    128-bit digest, so prefix-threshold compares are exact."""
    return F.md5(key.cast("string"))


def pct_threshold(pct: float) -> str:
    """First 8 hex digits of pct%% of the 32-bit space; comparing the
    full digest against this prefix keeps pct%% of uniform keys
    (strings longer than an equal prefix sort greater, so boundary
    digests are excluded — same rule in Spark and DuckDB)."""
    if not 0.0 < pct < 100.0:
        raise ValueError(f"pct must be in (0, 100), got {pct}")
    return format(int(pct / 100.0 * 2**32), "08x")


def deterministic_sample(df: DataFrame, key: Column, pct: float) -> DataFrame:
    """Keep pct%% of rows, chosen by key digest — stable under
    re-partitioning, re-runs, and engine changes."""
    return df.filter(hash_bucket(key) < pct_threshold(pct))


def train_test_split(
    df: DataFrame, key: Column, test_pct: float = 40.0
) -> DataFrame:
    """Label every row 'train'/'test' by key digest (the reference's
    60/40 randomSplit, made key-stable).  A row's side never changes,
    so incremental data can't leak across the boundary."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key) < pct_threshold(test_pct), "test").otherwise(
            "train"
        ),
    )


# ----------------------------------------------------------- queries
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% key-stable sample of orders, aggregated by status so the
    check is value-sensitive (count + sum over the sampled subset)."""
    orders = _t(spark, sf_dir, "orders")
    sampled = deterministic_sample(orders, F.col("o_orderkey"), 10.0)
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


SAMPLE_HASH_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE md5(CAST(o_orderkey AS VARCHAR)) < '19999999'
GROUP BY o_orderstatus
"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 60/40 split re-expressed key-stable, summarized
    per (split, label-ish group) — checks both the assignment and that
    proportions land near 60/40 without any RNG."""
    ev = _t(spark, sf_dir, "events")
    split = train_test_split(ev, F.col("event_id"), test_pct=40.0)
    return split.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


TRAIN_TEST_SPLIT_SQL = """
SELECT CASE WHEN md5(CAST(event_id AS VARCHAR)) < '66666666'
            THEN 'test' ELSE 'train' END AS split,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_user_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level holdout: ALL events of ~20% of users.  Row-level
    splits leak a user's behavior across train/eval; keying the digest
    on user_id keeps each user wholly on one side.  The predicate is
    computed on the fact row — no user-table join, no exchange."""
    ev = _t(spark, sf_dir, "events")
    held = deterministic_sample(ev, F.col("user_id"), 20.0)
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


USER_HOLDOUT_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types
FROM events
WHERE md5(CAST(user_id AS VARCHAR)) < '33333333'
GROUP BY user_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (downsample the majority language, keep all
    of the rare ones) — the corpus-balancing move every LLM data
    pipeline makes.  Rates ride in a CASE on the stratum column, so
    this is still a pure row-predicate: zero shuffle before the
    summary agg."""
    docs = _t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", F.lit(pct_threshold(25.0)))
        .when(F.col("lang") == "de", F.lit(pct_threshold(50.0)))
        .otherwise(F.lit(pct_threshold(99.0)))
    )
    kept = docs.filter(hash_bucket(F.col("doc_id")) < rate)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


STRATIFIED_SAMPLE_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) <
      CASE WHEN lang = 'en' THEN '40000000'
           WHEN lang = 'de' THEN '80000000'
           ELSE 'fd70a3d7' END
GROUP BY lang
"""


# ------------------------------------------- per-group deterministic top-k
def group_topk_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col,
    k: int,
) -> DataFrame:
    """Keep exactly min(k, group size) rows per group, chosen by md5
    order of the key — the deterministic replacement for per-group
    reservoir sampling.  Unlike the threshold samplers above (Bernoulli
    by hash: group yield varies), this bounds EVERY group to k rows,
    which is what per-user eval sets and skew-capped exports need.  One
    exchange on the group keys; the window's sort is the per-partition
    sort Spark already pays for any per-group ranking."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(key_col.cast("string")).asc(), key_col.asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def q_group_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≤5 events per (user, event_type), summarized per type: value-
    sensitive check that the SAME rows are chosen on both engines."""
    ev = _t(spark, sf_dir, "events")
    kept = group_topk_sample(
        ev, ["user_id", "event_type"], F.col("event_id"), k=5
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


GROUP_TOPK_SAMPLE_SQL = """
WITH ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (
      PARTITION BY user_id, event_type
      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
    ) AS rk
  FROM events
)
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM ranked WHERE rk <= 5
GROUP BY event_type
"""


# ------------------------------------------- weighted bottom-k sample
#
# Size-weighted sampling WITHOUT floating point: each document gets
# ceil(n_chars / TICKET_UNIT) "tickets" (capped), every ticket is
# hashed with the shared 60-bit md5 recipe, and a document's priority
# is its MINIMUM ticket hash.  P(priority <= x) = 1 - (1 - x)^tickets,
# so the k smallest priorities are (approximately) a probability-
# proportional-to-size sample without replacement — the bottom-k /
# priority-sampling idea (Cohen & Kaplan, "Summarizing data using
# bottom-k sketches", PODC 2007) with integer weights realized as key
# replication.  Everything is integer end-to-end: no pow()/ln() whose
# libm rounding could diverge between the JVM and the DuckDB oracle.
#
# Scale notes: the per-row transform is bounded by MAX_TICKETS (64)
# hash evaluations inside whole-stage codegen — no explode, the ticket
# array never leaves its row.  Top-k runs as TakeOrderedAndProject
# (per-partition heaps + driver merge of k rows), never a total sort.

TICKET_UNIT_CHARS = 80
MAX_TICKETS = 64
WEIGHTED_SEED = 73
WEIGHTED_K = 25

_TICKETS_SQL = (
    f"least(greatest((n_chars + {TICKET_UNIT_CHARS - 1}) "
    f"DIV {TICKET_UNIT_CHARS}, 1L), {MAX_TICKETS}L)"
)


def weighted_sample_by_size(docs: DataFrame, k: int = WEIGHTED_K) -> DataFrame:
    """k documents sampled ~proportionally to n_chars, deterministic."""
    from .sketches import _hash60_spark_sql

    ticket_hash = _hash60_spark_sql(
        "concat(cast(doc_id as string), ':', cast(t as string))",
        WEIGHTED_SEED,
    )
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.expr(_TICKETS_SQL).alias("tickets"),
        )
        .withColumn(
            "priority",
            F.expr(
                f"array_min(transform(sequence(1L, tickets), "
                f"t -> {ticket_hash}))"
            ),
        )
        .orderBy("priority", "doc_id")
        .limit(k)
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted bottom-k sample of ``documents``."""
    return weighted_sample_by_size(_t(spark, sf_dir, "documents"))


def _weighted_sample_sql() -> str:
    from .sketches import _hash60_sql

    ticket_hash = _hash60_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(t AS VARCHAR)", WEIGHTED_SEED
    )
    return f"""
WITH t AS (
  SELECT doc_id, n_chars,
         LEAST(GREATEST((n_chars + {TICKET_UNIT_CHARS - 1})
               // {TICKET_UNIT_CHARS}, 1), {MAX_TICKETS}) AS tickets
  FROM documents
),
p AS (
  SELECT doc_id, n_chars, tickets,
         list_min(list_transform(range(1, tickets + 1),
            t -> {ticket_hash})) AS priority
  FROM t
)
SELECT doc_id, n_chars, CAST(tickets AS BIGINT) AS tickets, priority
FROM p ORDER BY priority, doc_id LIMIT {WEIGHTED_K}
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()
