"""Margin-based bitext mining (parallel-corpus pair extraction).

The CCMatrix/WikiMatrix recipe (Artetxe & Schwenk, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings", ACL
2019; Schwenk et al. 2021): for a source sentence x and target
candidate y, plain cosine is miscalibrated across embedding-space
hubs, so the mining score is the RATIO margin

    margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

where avgNN_k(x) is the mean cosine of x's k nearest neighbors in the
OTHER language's corpus (and symmetrically for y).  A pair is mined
when the forward-best candidate clears a margin threshold — hub
sentences whose neighborhood is uniformly close get discounted.

Sides are synthesized deterministically from the embeddings table
(vec_id % 2: even = source language, odd = target) — the same
convention the ANN family uses for its query sets.  The registry
query mines an ARRIVING BATCH of BT_BATCH source sentences against
the full target side: the incremental shape of a production mining
pipeline (a full-corpus run maps this pass over source partitions and
swaps the brute forward scan for the IVF/graph candidates already in
``similarity.py`` / ``graph_ann.py`` — candidate generation is the
only corpus-scale stage).

Scale shape: the forward scan is |batch| x |tgt| with the batch
BROADCAST (the documented bounded-audit shape of q_knn_brute and the
recall evals); the backward pass scores only the <= |batch| distinct
forward-best candidates against the source side.  All margins are
exact-integer arithmetic: cosines land as FLOOR(cos * 1e6) BIGINTs,
the k-NN sums stay integral, and the final margin is one
integer/integer double division rounded to 6 dp — order-free and
engine-stable (the 1e6-scaled-LONG pattern used across the repo).

Reference parity: the reference engine has no mining stage; this is
LLM-data-pipeline extension surface (SURVEY.md §2.12) alongside the
dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table
from .similarity import _DOT, _N1, _N2

BT_BATCH = 25    # arriving source sentences per mining pass
BT_K = 4         # neighbors in the margin denominators
BT_THRESHOLD = 1.06  # ratio-margin mining threshold

_COS_RAW = f"({_DOT}) / (({_N1}) * ({_N2}))"
# FLOOR to 1e6-scaled LONG: all ranking and margin arithmetic is then
# exact integer work; both engines floor the same double
_COS6 = f"CAST(FLOOR(({_COS_RAW}) * 1000000) AS BIGINT)"


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    return src, tgt


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    batch_ids_below: int = 2 * BT_BATCH,
    k: int = BT_K,
    threshold: float = BT_THRESHOLD,
) -> DataFrame:
    """(src_id, tgt_id, cosine, margin, mined): forward-best target
    per batch source sentence with its ratio margin."""
    batch = src.filter(F.col("vec_id") < batch_ids_below).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("e1")
    )
    # forward: batch x tgt, batch broadcast — the bounded-audit scan
    fw = (
        tgt.select(F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("e2"))
        .join(F.broadcast(batch))
        .select("src_id", "tgt_id", F.expr(_COS6).alias("c6"))
    )
    wx = Window.partitionBy("src_id").orderBy(
        F.col("c6").desc(), F.col("tgt_id").asc()
    )
    ranked = fw.withColumn("rn", F.row_number().over(wx))
    nn_x = (
        ranked.filter(F.col("rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("c6").alias("sum_x"))
    )
    best = ranked.filter(F.col("rn") == 1).select("src_id", "tgt_id", "c6")
    # backward: the <= |batch| distinct forward-best candidates vs the
    # full source side (x itself included, per the paper)
    ys = (
        best.select("tgt_id").distinct()
        .join(
            tgt.select(F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("e1")),
            "tgt_id",
        )
    )
    bw = (
        src.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e2"))
        .join(F.broadcast(ys))
        .select("tgt_id", "cand_id", F.expr(_COS6).alias("c6b"))
    )
    wy = Window.partitionBy("tgt_id").orderBy(
        F.col("c6b").desc(), F.col("cand_id").asc()
    )
    nn_y = (
        bw.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("c6b").alias("sum_y"))
    )
    denom = F.col("sum_x") + F.col("sum_y")
    margin = F.when(
        denom > 0,
        F.round(F.lit(2 * k) * F.col("c6") / denom, 6),
    )
    return (
        best.join(nn_x, "src_id")
        .join(nn_y, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("c6") / F.lit(1e6), 6).alias("cosine"),
            margin.alias("margin"),
            (F.coalesce(margin, F.lit(0.0)) >= threshold).alias("mined"),
        )
    )


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine the arriving source batch against the target side."""
    src, tgt = _sides(spark, sf_dir)
    return mine_bitext(src, tgt)


# ------------------------------------------------- DuckDB oracle

_SQL_COS_RAW = (
    "(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))))"
)


def _sql_c6(a: str, b: str) -> str:
    return (
        f"CAST(FLOOR({_SQL_COS_RAW.format(a=a, b=b)} * 1000000) AS BIGINT)"
    )


BITEXT_MINE_SQL = f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
src AS (SELECT * FROM emb WHERE vec_id % 2 = 0),
tgt AS (SELECT * FROM emb WHERE vec_id % 2 = 1),
batch AS (SELECT vec_id AS src_id, e AS e1 FROM src
          WHERE vec_id < {2 * BT_BATCH}),
fw AS MATERIALIZED (
  SELECT b.src_id, t.vec_id AS tgt_id, {_sql_c6("b.e1", "t.e")} AS c6,
    ROW_NUMBER() OVER (PARTITION BY b.src_id
      ORDER BY {_sql_c6("b.e1", "t.e")} DESC, t.vec_id ASC) AS rn
  FROM batch b, tgt t
),
nn_x AS (
  SELECT src_id, SUM(c6) AS sum_x FROM fw WHERE rn <= {BT_K}
  GROUP BY src_id
),
best AS (SELECT src_id, tgt_id, c6 FROM fw WHERE rn = 1),
ys AS (
  SELECT DISTINCT b.tgt_id, t.e AS e1 FROM best b
  JOIN tgt t ON t.vec_id = b.tgt_id
),
bw AS MATERIALIZED (
  SELECT y.tgt_id, s.vec_id AS cand_id, {_sql_c6("y.e1", "s.e")} AS c6b,
    ROW_NUMBER() OVER (PARTITION BY y.tgt_id
      ORDER BY {_sql_c6("y.e1", "s.e")} DESC, s.vec_id ASC) AS rn
  FROM ys y, src s
),
nn_y AS (
  SELECT tgt_id, SUM(c6b) AS sum_y FROM bw WHERE rn <= {BT_K}
  GROUP BY tgt_id
)
SELECT b.src_id, b.tgt_id,
  ROUND(b.c6 / 1000000.0, 6) AS cosine,
  CASE WHEN x.sum_x + y.sum_y > 0
    THEN ROUND({2 * BT_K} * b.c6 / (x.sum_x + y.sum_y), 6) END AS margin,
  COALESCE(CASE WHEN x.sum_x + y.sum_y > 0
    THEN ROUND({2 * BT_K} * b.c6 / (x.sum_x + y.sum_y), 6) END, 0.0)
    >= {BT_THRESHOLD} AS mined
FROM best b
JOIN nn_x x USING (src_id)
JOIN nn_y y USING (tgt_id)
"""
