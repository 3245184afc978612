"""Similarity search: the Arrow/Pandas-UDF cosine path must agree
exactly (after shared rounding) with the Column-expression path, and
the IVF variant must return a subset consistent with brute force."""

from __future__ import annotations

from activity_classifier_spark_cassandra_spark.operators.similarity import (
    q_knn_brute,
    q_knn_ivf,
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
