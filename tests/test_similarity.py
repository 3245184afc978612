"""Similarity search: the Arrow/Pandas-UDF cosine path must agree
exactly (after shared rounding) with the Column-expression path, and
the IVF variant must return a subset consistent with brute force."""

from __future__ import annotations

from activity_classifier_spark_cassandra_spark.operators.similarity import (
    PLANES,
    q_knn_brute,
    q_knn_ivf,
    q_knn_lsh,
    q_knn_pandas,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )


def test_pandas_udf_matches_expression_path(spark):
    assert _rows(q_knn_pandas(spark, SF)) == _rows(q_knn_brute(spark, SF))


def test_ivf_results_are_cluster_local_topk(spark):
    """Each IVF neighbor must score <= the brute-force best for the
    same query (IVF restricts the candidate set, never improves it)."""
    brute_best = {}
    for qid, _nid, cos, rank in _rows(q_knn_brute(spark, SF)):
        if rank == 1:
            brute_best[qid] = cos
    for qid, _nid, cos, rank in _rows(q_knn_ivf(spark, SF)):
        assert cos <= brute_best[qid] + 1e-9


def test_lsh_pairs_share_a_band_and_never_beat_brute(spark):
    """Every LSH neighbor must share >= 1 of the 4 band values with its
    query (recomputed locally in numpy), and — since LSH restricts the
    candidate set — no LSH hit may outscore the brute-force best."""
    import numpy as np

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    a = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    bits = (a @ np.array(PLANES).T) >= 0.0
    weights = 1 << np.arange(4)
    bands = {
        vid: tuple(
            int(bits[i, 4 * b:4 * b + 4] @ weights) for b in range(4)
        )
        for i, vid in enumerate(emb["vec_id"])
    }
    brute_best = {}
    for qid, _nid, cos, rank in _rows(q_knn_brute(spark, SF)):
        if rank == 1:
            brute_best[qid] = cos
    got = _rows(q_knn_lsh(spark, SF))
    assert got, "LSH returned nothing at sf0.001"
    for qid, nid, cos, _rank in got:
        shared = any(
            bands[qid][b] == bands[nid][b] for b in range(4)
        )
        assert shared, (qid, nid, bands[qid], bands[nid])
        assert cos <= brute_best[qid] + 1e-9
