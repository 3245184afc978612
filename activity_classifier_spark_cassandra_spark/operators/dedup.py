"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash-with-banding, SimHash, and embedding-cosine
near-dup — over ``documents`` / ``embeddings``.

Scale design (the whole point — these must survive 100 TB):
- exact dedup groups on the md5 **digest**, never the raw text, so the
  exchange carries 32 bytes per row instead of whole documents.
- n-gram Jaccard and MinHash both reduce to an equi-join on an
  exploded key (shingle / (band, minhash)) — Spark's bread-and-butter
  shuffle join, linear in corpus size + candidate pairs; no O(n²)
  cross join anywhere.
- MinHash banding with r=1 rows/band means candidates = "pairs sharing
  ≥1 of the 16 minhashes", which is *exactly* the set of pairs whose
  estimated Jaccard ≥ 1/16 — so the bucket join loses nothing vs the
  brute-force oracle and the results match bit-for-bit.
- SimHash is a pure projection (one 16-bit signature per doc) + a
  groupBy on the signature.
- embedding near-dup uses the coarse cluster id (``label``) as an
  IVF-style partition: candidate pairs only within a cluster.

MinHash values are md5 hex strings compared lexicographically (same
binary collation in Spark and DuckDB) — avoids any cross-engine
integer-hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .text import _TOKENIZE, _TOKENIZE_SPARK

N_MINHASH = 16
SHINGLE_K = 3


# ------------------------------------------------------------ exact
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per identical text (keep min doc_id).
    Hash-groupBy on the digest; partial agg makes the exchange tiny."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ------------------------------------------------------------ shingles
def _shingles_spark() -> str:
    """Distinct word-3-gram shingles as a Spark SQL expression
    (0-based array indexing)."""
    t = _TOKENIZE_SPARK
    return (
        f"array_distinct(transform(sequence(0, size({t}) - {SHINGLE_K}),"
        f" i -> concat_ws(' ', {t}[i], {t}[i+1], {t}[i+2])))"
    )


def _shingles_duckdb() -> str:
    """Same shingles in DuckDB (1-based list indexing)."""
    t = _TOKENIZE
    return (
        f"list_distinct(list_transform(range(len({t}) - {SHINGLE_K - 1}),"
        f" i -> {t}[i+1] || ' ' || {t}[i+2] || ' ' || {t}[i+3]))"
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("toks", F.expr(_TOKENIZE_SPARK))
        .filter(F.size("toks") >= SHINGLE_K)
        .select("doc_id", F.expr(_shingles_spark()).alias("shingles"))
    )


_DOC_SHINGLES_CTE = f"""
doc_shingles AS (
  SELECT doc_id, {_shingles_duckdb()} AS shingles
  FROM documents
  WHERE LEN({_TOKENIZE}) >= {SHINGLE_K}
)
"""


# ------------------------------------------------------------ jaccard
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.1.

    explode(shingles) -> self-equi-join on shingle -> count common ->
    join per-doc shingle counts -> filter.  The only quadratic term is
    per-shingle collision lists, which is the textbook trade; hot
    (stop) shingles would be frequency-capped at real scale."""
    sh = _doc_shingles(spark, sf_dir)
    counts = sh.select(
        "doc_id", F.size("shingles").cast("long").alias("n_sh")
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    c1 = counts.select(
        F.col("doc_id").alias("doc1"), F.col("n_sh").alias("n1")
    )
    c2 = counts.select(
        F.col("doc_id").alias("doc2"), F.col("n_sh").alias("n2")
    )
    jacc = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        common.join(c1, "doc1")
        .join(c2, "doc2")
        .withColumn("jaccard", F.round(jacc, 6))
        .filter(F.col("jaccard") >= 0.1)
        .select("doc1", "doc2", "n_common", "jaccard")
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {_DOC_SHINGLES_CTE},
counts AS (
  SELECT doc_id, LEN(shingles) AS n_sh FROM doc_shingles
),
ex AS (
  SELECT doc_id, UNNEST(shingles) AS sh FROM doc_shingles
),
common AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, n_common,
       ROUND(n_common / (c1.n_sh + c2.n_sh - n_common), 6) AS jaccard
FROM common
JOIN counts c1 ON c1.doc_id = doc1
JOIN counts c2 ON c2.doc_id = doc2
WHERE ROUND(n_common / (c1.n_sh + c2.n_sh - n_common), 6) >= 0.1
"""


# ------------------------------------------------------------ minhash
def _minhash_spark() -> str:
    """16 minhashes: per band i, min over shingles of md5(i || ':' || s)
    (hex strings, lexicographic min)."""
    return (
        f"transform(sequence(0, {N_MINHASH - 1}),"
        f" i -> array_min(transform(shingles,"
        f" s -> md5(concat(cast(i AS STRING), ':', s)))))"
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup with LSH banding (r=1, b=16): explode
    (band, minhash) keys, equi-join buckets, count matching bands,
    estimate Jaccard = matches/16, keep >= 0.25.

    With one row per band the bucket join finds every pair sharing any
    minhash — a superset of every pair with est >= 1/16 — so no
    candidate the brute-force oracle would keep is ever missed."""
    sh = _doc_shingles(spark, sf_dir)
    mh = sh.select("doc_id", F.expr(_minhash_spark()).alias("mh"))
    bands = mh.select(
        "doc_id",
        F.posexplode("mh").alias("band", "h"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    est = F.col("n_match") / F.lit(float(N_MINHASH))
    return (
        matches.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= 0.25)
        .select("doc1", "doc2", "n_match", "est_jaccard")
    )


_MINHASH_DUCKDB = (
    f"list_transform(range({N_MINHASH}),"
    f" i -> list_min(list_transform(shingles,"
    f" s -> md5(CAST(i AS VARCHAR) || ':' || s))))"
)

DEDUP_MINHASH_SQL = f"""
WITH {_DOC_SHINGLES_CTE},
mh AS (
  SELECT doc_id, {_MINHASH_DUCKDB} AS mh FROM doc_shingles
),
bands AS (
  SELECT doc_id, i - 1 AS band, mh[i] AS h
  FROM mh, UNNEST(range(1, {N_MINHASH} + 1)) AS t(i)
),
matches AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_match
  FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2, n_match,
       ROUND(n_match / {N_MINHASH}.0, 6) AS est_jaccard
FROM matches
WHERE ROUND(n_match / {N_MINHASH}.0, 6) >= 0.25
"""


# ------------------------------------------------------------ simhash
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (token-hash bit voting), grouped by
    signature — docs sharing a signature are near-dup candidates.
    Pure projection + one narrow groupBy; hamming-neighbor lookup
    would add rotations of the same signature key."""
    docs = load_table(spark, sf_dir, "documents")
    # per-token 16-bit hash from the first 4 hex chars of md5
    tok_hash = (
        f"transform({_TOKENIZE_SPARK},"
        f" t -> cast(conv(substring(md5(t), 1, 4), 16, 10) AS INT))"
    )
    # bit j vote: sum(+1 if bit set else -1) > 0 -> bit j of signature
    bit_votes = (
        f"transform(sequence(0, 15), j -> "
        f"CASE WHEN aggregate({tok_hash}, 0,"
        f" (acc, h) -> acc + CASE WHEN (h & shiftleft(1, j)) > 0"
        f" THEN 1 ELSE -1 END) > 0 THEN shiftleft(1, j) ELSE 0 END)"
    )
    sig = f"aggregate({bit_votes}, 0, (acc, b) -> acc + b)"
    return (
        docs.select("doc_id", F.expr(sig).cast("long").alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.min("doc_id").alias("first_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


_TOK_HASH_DUCKDB = (
    f"list_transform({_TOKENIZE},"
    f" t -> CAST('0x' || substr(md5(t), 1, 4) AS INTEGER))"
)

SIMHASH_SQL = f"""
WITH sigs AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(16), j ->
      CASE WHEN list_sum(list_transform({_TOK_HASH_DUCKDB}, h ->
             CASE WHEN (h & (1 << j)) > 0 THEN 1 ELSE -1 END)) > 0
           THEN (1 << j) ELSE 0 END)) AS BIGINT) AS simhash
  FROM documents
)
SELECT simhash, MIN(doc_id) AS first_doc_id, COUNT(*) AS n_docs
FROM sigs GROUP BY simhash
"""


# ------------------------------------------------------------ embeddings
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within IVF-style coarse clusters: the
    provided ``label`` is the cluster id, so candidate pairs are
    cluster-local (n²/k instead of n²).  Cosine in pure Column
    expressions (zip_with + aggregate, double math, element order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec1"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("e1"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec2"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("e2"),
    )
    dot = (
        "aggregate(zip_with(e1, e2, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    n1 = (
        "sqrt(aggregate(e1, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    n2 = (
        "sqrt(aggregate(e2, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    cos = F.expr(f"({dot}) / (({n1}) * ({n2}))")
    return (
        a.join(b, "lbl")
        .filter(F.col("vec1") < F.col("vec2"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= 0.8)
        .select("vec1", "vec2", "lbl", "cosine")
    )


DEDUP_EMBEDDING_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS vec1, b.vec_id AS vec2, a.label AS lbl,
    ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(a.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])))), 6)
      AS cosine
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec1, vec2, lbl, cosine FROM pairs WHERE cosine >= 0.8
"""
