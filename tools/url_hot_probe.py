"""Hot-key URL dedup probe (round-11 verdict item 6, round-12 hybrid).

Measures the three first-occurrence shapes over the canonical-URL key
at 20M rows, on BOTH corpus shapes that matter:

* hot  — >=20% of all rows remapped onto ONE canonical URL (the
  boilerplate-page case the agg shape exists for);
* flat — every canonical key holds ~3 rows (a normal crawl slice).

Shapes: shipped agg+join-back (``url_dedup``), the window strawman,
and the round-12 hot-key-routed hybrid (``url_dedup_hybrid`` —
sampled detection, window for cold keys, agg+broadcast-join-back for
hot ones).  The hybrid's bar: ~= window on flat, bounded tasks AND
<= agg wall on hot.

Usage: python tools/url_hot_probe.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tools.scale_probe import get_spark, _max_stage_id, _shuffle_bytes_since


def hot_urls_range(spark, rows: int) -> DataFrame:
    """rows synthetic raw URLs straight from range(): 20% on ONE raw
    URL (one canonical hot key), the rest page-distinct — the shape a
    boilerplate page has in a real crawl, at a size where one key's
    rows do NOT fit one task comfortably."""
    base = spark.range(rows).select(F.col("id").alias("doc_id"))
    page = "CAST(doc_id DIV 3 AS STRING)"
    site = "CAST((doc_id DIV 3) % 2500 AS STRING)"
    url = (
        f"CASE WHEN doc_id % 5 = 0 THEN"
        f" 'https://hot.example.com/boilerplate?utm_source=x'"
        f" ELSE concat('https://www.s', {site}, '.example.com/articles/',"
        f" {page}, '?b=2&a=1&utm_campaign=', CAST(doc_id % 7 AS STRING))"
        f" END"
    )
    return base.select("doc_id", F.expr(url).alias("url"))


def flat_urls_range(spark, rows: int) -> DataFrame:
    """Same generator WITHOUT the hot-key remap: ~3 rows per
    canonical key — the non-adversarial corpus the agg shape was
    paying 2.6x on."""
    base = spark.range(rows).select(F.col("id").alias("doc_id"))
    page = "CAST(doc_id DIV 3 AS STRING)"
    site = "CAST((doc_id DIV 3) % 2500 AS STRING)"
    url = (
        f"concat('https://www.s', {site}, '.example.com/articles/',"
        f" {page}, '?b=2&a=1&utm_campaign=', CAST(doc_id % 7 AS STRING))"
    )
    return base.select("doc_id", F.expr(url).alias("url"))


def window_strawman(df: DataFrame) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import (
        canonicalize_urls,
    )

    canon = canonicalize_urls(df)
    w = Window.partitionBy("canon_url").orderBy("doc_id")
    return canon.withColumn(
        "keep", F.row_number().over(w) == 1
    )


def shipped_agg(df: DataFrame) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import url_dedup

    return url_dedup(df)


def hybrid(df: DataFrame) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import (
        url_dedup_hybrid,
    )

    return url_dedup_hybrid(df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()
    spark = get_spark()
    for corpus, gen in (("hot", hot_urls_range), ("flat", flat_urls_range)):
        df = (
            gen(spark, args.rows)
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        for name, fn in (
            ("agg+joinback", shipped_agg),
            ("window", window_strawman),
            ("hybrid", hybrid),
        ):
            def run():
                t0 = time.time()
                fn(df).write.format("noop").mode("overwrite").save()
                return time.time() - t0
            w = run()
            floor = _max_stage_id(spark)
            t1, t2 = run(), run()
            rd, wr = _shuffle_bytes_since(spark, floor)
            print(
                f"RESULT {corpus} {name}: warm={w:.1f}s"
                f" min2={min(t1, t2):.1f}s"
                f" shuffle_read(2r)={rd/1e6:.1f}MB write={wr/1e6:.1f}MB",
                flush=True,
            )
        df.unpersist()


if __name__ == "__main__":
    main()
