"""Capture the FULL beam-search hop-loop physical plan (no checkpoint
truncation) so per-hop Exchange counts are auditable.

``beam_search`` localCheckpoints the frontier every third hop, so the
plan a registry query returns is only the final segment — the per-hop
shape (the thing the round-12/13 optimization work changes) is hidden
behind Scan ExistingRDD nodes.  This probe monkeypatches
``DataFrame.localCheckpoint`` to the identity INSIDE the search only
(the graph build underneath stays checkpointed, keeping the dump
readable) and explains the resulting 1-entry + HOPS-hop plan.

Usage: python tools/beam_plan_probe.py <out_file> [sf_dir]
       (default sf_dir /root/testdata/sf0.001 — plan shape is
        SF-independent)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activity_classifier_spark_cassandra_spark.operators import (  # noqa: E402
    graph_ann as GA,
)
from activity_classifier_spark_cassandra_spark.session import get_spark  # noqa: E402
from activity_classifier_spark_cassandra_spark.sources.io import load_table  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    out_file = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="beam_plan_probe")
    emb = load_table(spark, sf_dir, "embeddings")
    graph = GA.memo_graph_q8(spark, sf_dir)  # checkpointed index table

    # patch the CONCRETE class (Spark 4: pyspark.sql.classic.dataframe
    # .DataFrame overrides the base method, so patching the base
    # pyspark.sql.DataFrame would not take)
    cls = type(emb)
    orig = cls.localCheckpoint
    cls.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        search = GA.beam_search(emb, graph)
    finally:
        cls.localCheckpoint = orig  # type: ignore

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        search.explain("formatted")
    with open(out_file, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {out_file} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
