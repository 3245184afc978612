"""Bench-style isolated timer: min-of-two noop-sink wall per query.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     TIME_RUNS (default 2).
Protocol matches bench.py (one q1 warmup, per-query min-of-N), so the
numbers are comparable to BENCH_DETAIL.json entries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activity_classifier_spark_cassandra_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("TIME_RUNS", "2"))
    spark = get_spark(
        app_name="time_queries",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = E.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup
    for name in sys.argv[1:]:
        times = [round(run(name), 3) for _ in range(n_runs)]
        print(f"TIMING {name}: min={min(times)} runs={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
