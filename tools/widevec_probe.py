"""Wide-vector probe: exact vs SQ8 NN-descent build at production dims.

The SQ8 build's case is byte-width: 1 byte/dim vs 4 on the adjacency
exchange.  The sf test embeddings are dim 64, where the thin id
exchanges dilute the savings to -31%; this probe generates a
deterministic dim-D corpus (default 512) and measures both builds on
it, so the asymptotic claim is a number, not arithmetic.

Vectors are float32 from a fixed-seed numpy generator — this is a
PERFORMANCE probe (both builds run the same data; no oracle), so the
seed only needs run-to-run stability on one host.

Usage: python tools/widevec_probe.py [N] [D]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tools.scale_probe import _max_stage_id, _shuffle_bytes_since, get_spark

from activity_classifier_spark_cassandra_spark.operators.graph_ann import (
    build_knn_graph,
    build_knn_graph_q8,
)

OUT = "/tmp/widevec"


def gen(n: int, d: int) -> str:
    path = f"{OUT}/emb_{n}_{d}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260816)
    # weak cluster structure like the sf tables: 10 centers + noise
    centers = rng.normal(size=(10, d)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    e = (centers[labels] + rng.normal(scale=2.0, size=(n, d))).astype(
        np.float32
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, path)
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    path = gen(n, d)
    spark = get_spark()
    emb = spark.read.parquet(path).repartition(32)
    emb = emb.localCheckpoint(eager=True)  # gen cost out of the timing

    rows = []
    for name, fn in (
        ("q_knn_graph (exact)", build_knn_graph),
        ("q_knn_graph_q8", build_knn_graph_q8),
    ):
        fn(emb).write.format("noop").mode("overwrite").save()  # warm
        best, bytes_rw = float("inf"), (0, 0)
        for _ in range(2):
            floor = _max_stage_id(spark)
            t0 = time.time()
            fn(emb).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            run_bytes = _shuffle_bytes_since(spark, floor)
            if wall < best:
                best, bytes_rw = wall, run_bytes
        rows.append((name, best, *bytes_rw))
        print(f"{name}: {best:.2f}s shuffle_read="
              f"{bytes_rw[0] / 1e6:.1f}MB", flush=True)

    print(f"\n| build | N | dim | wall (min of 2) | shuffle read |")
    print("|---|---|---|---|---|")
    for name, w, rd, _ in rows:
        print(f"| {name} | {n:,} | {d} | {w:.2f}s | {rd / 1e6:,.1f} MB |")


if __name__ == "__main__":
    main()
