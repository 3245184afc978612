"""Greedy k-center coreset selection (operators/coreset.py): full
independent numpy replay of the greedy loop and the coverage
assignment, plus the Gonzalez cover-radius property."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from activity_classifier_spark_cassandra_spark.operators import coreset as CS

SF = "/root/testdata/sf0.001"


def _replay(ids, E, k):
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    centers = [0]  # index of lowest vec_id
    d2all = np.round(
        ((E[:, None, :] - E[None, :, :]) ** 2).sum(axis=2), 6
    )
    mind2 = d2all[:, centers[0]].copy()
    for _ in range(1, k):
        best = np.lexsort((ids, -mind2))[0]
        centers.append(int(best))
        mind2 = np.minimum(mind2, d2all[:, best])
    # assignment: nearest center, ties to earlier selection round
    sel = np.array(centers)
    D = d2all[:, sel]
    rounds = np.arange(len(sel))
    nearest = np.array(
        [np.lexsort((rounds, D[i]))[0] for i in range(len(ids))]
    )
    return ids, sel, nearest, D[np.arange(len(ids)), nearest]


def test_kcenter_matches_numpy_replay(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids_s, sel, nearest, dmin = _replay(ids, E, CS.K_CENTERS)

    out = CS.q_coreset_kcenter(spark, SF).toPandas().sort_values("vec_id")
    got_centers = sorted(out[out.is_center].vec_id)
    assert got_centers == sorted(int(ids_s[c]) for c in sel)
    want_center = {int(ids_s[i]): int(ids_s[sel[nearest[i]]]) for i in range(len(ids_s))}
    want_d2 = {int(ids_s[i]): dmin[i] for i in range(len(ids_s))}
    for r in out.itertuples():
        assert int(r.center_id) == want_center[int(r.vec_id)], r.vec_id
        assert abs(r.d2_min - want_d2[int(r.vec_id)]) < 1.5e-6, r.vec_id


def test_kcenter_cover_radius_shrinks(spark):
    """Gonzalez invariant: the cover radius (max d2_min) under k
    centers must be <= the radius under any prefix of the selection
    — i.e. adding centers never worsens coverage, and with k > 1 it
    strictly helps on this corpus."""
    from activity_classifier_spark_cassandra_spark.sources.io import (
        load_table,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    centers = CS.kcenter_select(emb, k=CS.K_CENTERS)
    radii = []
    for pfx in (1, 4, CS.K_CENTERS):
        lit = CS._centers_literal(centers[:pfx])
        d2 = CS._D2_FOLD.format(x="embedding", c="c.c")
        mind2 = F.expr(f"array_min(transform({lit}, c -> {d2}))")
        radii.append(
            emb.select(F.max(mind2).alias("r")).collect()[0].r
        )
    assert radii[0] > radii[1] > radii[2], radii
