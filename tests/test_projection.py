"""JL projection + distortion/recall audit (operators/projection.py):
independent numpy replay of the quantize→project→audit chain."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from activity_classifier_spark_cassandra_spark.operators import projection as PJ

SF = "/root/testdata/sf0.001"


def test_sign_matrix_is_full_rank():
    """Regression pin for the checkerboard bug: parity of
    (i*odd + j*odd) is parity(i+j) — a rank-1 sign matrix that
    silently destroyed the projection (recall 0.0).  Bit 16 mixes."""
    S = np.array(PJ._SIGNS)
    assert np.linalg.matrix_rank(S) == PJ.JL_DIM_OUT


def test_jl_audit_matches_numpy_replay(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    o = np.argsort(ids)
    ids, E = ids[o], E[o]
    S = np.array(PJ._SIGNS, dtype=np.int64)
    xq = np.floor(E * PJ.JL_Q + 0.5).astype(np.int64)
    Y = xq @ S.T

    out = (
        PJ.q_jl_recall_eval(spark, SF).toPandas().set_index("query_id")
    )
    assert len(out) == 10

    # full-space truth (same rounded-cosine rule as q_knn_brute)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = np.round(En @ En.T, 6)
    np.fill_diagonal(C, -2)
    Yn = Y / np.linalg.norm(Y.astype(np.float64), axis=1, keepdims=True)
    CY = np.round(Yn @ Yn.T, 6)
    np.fill_diagonal(CY, -2)

    n = len(ids)
    for q in range(10):
        truth = set(np.lexsort((np.arange(n), -C[q]))[:5])
        got5 = set(np.lexsort((np.arange(n), -CY[q]))[:5])
        want_hits = len(got5 & truth)
        assert int(out.loc[q, "n_hits"]) == want_hits, q

        d2q = ((xq[q] - xq) ** 2).sum(axis=1)
        d2p = ((Y[q] - Y) ** 2).sum(axis=1)
        mask = (np.arange(n) != q) & (d2q > 0)
        rel = np.round(
            np.abs(d2p[mask] / (PJ.JL_DIM_OUT * d2q[mask].astype(float)) - 1.0),
            9,
        )
        assert abs(out.loc[q, "mean_rel_err"] - round(rel.mean(), 6)) < 2e-6
        assert abs(out.loc[q, "max_rel_err"] - round(rel.max(), 6)) < 2e-6
