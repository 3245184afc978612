"""100x delta-termination probe (round-11).

Generates a CLUSTERED 200k-vector dim-64 corpus (the convergent
regime NN-descent's delta-stop exists for — the driver's near-random
testdata never converges inside G_ITERS rounds, by design of that
data, not the rule), then measures build_knn_graph_q8 wall + shuffle
with the shipped delta=0.01 vs delta=0 (all G_ITERS rounds), plus the
realized round counts.  Also prints the per-round update counts of
the delta=0 build so the trajectory is on record.

Usage: python tools/delta_probe.py [--n 200000] [--clusters 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.scale_probe import get_spark, _max_stage_id, _shuffle_bytes_since


def gen_clustered(spark, n, clusters, out, noise=1e-2, dim=64):
    """n unit-norm vectors in `clusters` tight clusters, float32 —
    deterministic (hash-seeded numpy per partition)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(4242)
    C = rng.normal(size=(clusters, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    def gen(it):
        for pdf in it:
            ids = pdf["vec_id"].to_numpy()
            local = np.random.default_rng(int(ids[0]) + 1)
            V = C[ids % clusters] + noise * local.normal(size=(len(ids), C.shape[1]))
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype("float32") for r in V]}
            )

    base = spark.range(n).select(F.col("id").alias("vec_id"))
    emb = base.repartition(64).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )
    emb.write.mode("overwrite").parquet(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--clusters", type=int, default=2_000)
    ap.add_argument("--noise", type=float, default=1e-2)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    spark = get_spark()
    from activity_classifier_spark_cassandra_spark.operators import graph_ann as GA

    out = "/tmp/scaleprobe/clustered_emb.parquet"
    if not args.skip_gen:
        t0 = time.time()
        gen_clustered(spark, args.n, args.clusters, out, args.noise)
        print(f"gen: {time.time() - t0:.1f}s", flush=True)
    emb = spark.read.parquet(out)

    for tag, delta in (("delta=0.01", GA.G_DELTA), ("delta=0 (all rounds)", 0.0)):
        floor = _max_stage_id(spark)
        t0 = time.time()
        g = GA.build_knn_graph_q8(emb, delta=delta)
        g.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        rd, wr = _shuffle_bytes_since(spark, floor)
        print(
            f"RESULT q8 build {tag}: wall={wall:.1f}s rounds="
            f"{GA.last_realized_rounds} shuffle_read={rd/1e9:.2f}GB"
            f" write={wr/1e9:.2f}GB",
            flush=True,
        )


if __name__ == "__main__":
    main()
