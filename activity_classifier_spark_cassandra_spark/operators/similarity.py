"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k for a (small, broadcast) query set —
the pattern that scales is *broadcast the queries, scan the corpus
once*: a 100 TB corpus is read in one pass, each partition scores its
rows against every query locally (no shuffle of the corpus), and only
per-partition top-k survivors reach the exchange (row_number over a
(query, score) window on already-thin data).

Scale path: IVF — restrict scoring to the query's coarse cluster
(here the provided ``label``), cutting scanned rows by the cluster
count; see q_dedup_embedding in dedup.py for the cluster-local join
variant.  A learned/LSH bucketing drops in the same shape.

Vector math stays in Column expressions (zip_with + aggregate with
double accumulation in element order) so the DuckDB oracle
(list_dot_product over DOUBLE[]) matches bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table

N_QUERIES = 10
TOP_K = 5

_DOT = (
    "aggregate(zip_with(e1, e2, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_N1 = (
    "sqrt(aggregate(e1, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_N2 = (
    "sqrt(aggregate(e2, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 10 vectors.
    Queries are broadcast; corpus is scanned once, partition-local."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("e1")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e2")
    )
    cos = F.expr(f"({_DOT}) / (({_N1}) * ({_N2}))")
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


KNN_BRUTE_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])))), 6)
      AS cosine
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed top-3: neighbors only from the query's own coarse
    cluster (label) — the scale path: each query scores 1/k of the
    corpus.  Exact within-cluster, like a trained IVF with nprobe=1."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("bucket"),
        F.col("embedding").alias("e1"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("bucket"),
        F.col("embedding").alias("e2"),
    )
    cos = F.expr(f"({_DOT}) / (({_N1}) * ({_N2}))")
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "bucket", "neighbor_id", "cosine", "rank")
    )


KNN_IVF_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS bucket, c.vec_id AS neighbor_id,
    ROUND(
      list_dot_product(CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])))), 6)
      AS cosine
  FROM embeddings q
  JOIN embeddings c ON c.label = q.label AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, bucket, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------- pandas UDF
# The Column-expression cosine above keeps everything JVM-side — right
# for narrow vectors.  For wide embeddings (1-4k dims) the per-element
# zip_with/aggregate tree gets tall; the production-scale alternative
# is an Arrow-batched Pandas UDF: one vectorized numpy einsum per
# record batch, ~constant overhead per 10k rows.  Both paths produce
# identical rounded scores (float64 accumulation), so they share the
# DuckDB oracle.


def _cosine_pandas_udf():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cos(e1: pd.Series, e2: pd.Series) -> pd.Series:
        a = np.stack(e1.to_numpy()).astype(np.float64)
        b = np.stack(e2.to_numpy()).astype(np.float64)
        dot = np.einsum("ij,ij->i", a, b)
        na = np.sqrt(np.einsum("ij,ij->i", a, a))
        nb = np.sqrt(np.einsum("ij,ij->i", b, b))
        return pd.Series(dot / (na * nb))

    # explicit non-string annotations: `from __future__ import
    # annotations` stringifies hints, which pandas_udf can't resolve
    # against this closure's namespace
    cos.__annotations__ = {"e1": pd.Series, "e2": pd.Series, "return": pd.Series}
    return pandas_udf(cos, "double")


def q_knn_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_knn_brute with the cosine computed by the Arrow-batched
    Pandas UDF instead of Column expressions — same broadcast-queries /
    single-corpus-scan / per-partition-top-k plan, same oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("e1")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e2")
    )
    cos = _cosine_pandas_udf()
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cos(F.col("e1"), F.col("e2")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
