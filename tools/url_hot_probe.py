"""Hot-key URL dedup probe (round-11 verdict item 6).

The skew-safety claim in operators/urls.py: first-occurrence via
groupBy(canon).agg(min(struct)) + join-back collapses a boilerplate
hot URL map-side, while a window over the canonical key must
single-partition-sort it.  This probe MEASURES that: Nx documents
with >=20% of all rows remapped onto ONE canonical URL, shipped
shape vs the window strawman, min of two warm runs + UI shuffle
counters.

Usage: python tools/url_hot_probe.py [--factors 10,100]
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


def hot_urls(spark, tag: str) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import (
        with_synthetic_urls,
    )

    docs = spark.read.parquet(f"/tmp/scaleprobe/{tag}/documents.parquet")
    urls = with_synthetic_urls(docs)
    # >=20% of rows -> ONE raw URL (one canonical hot key)
    return urls.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("https://hot.example.com/boilerplate?utm_source=x"),
        ).otherwise(F.col("url")),
    )


def window_strawman(df: DataFrame) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import (
        canonicalize_urls,
    )

    canon = canonicalize_urls(df)
    w = Window.partitionBy("canon_url").orderBy("doc_id")
    return canon.withColumn(
        "keep", F.row_number().over(w) == 1
    )


def shipped(df: DataFrame) -> DataFrame:
    from activity_classifier_spark_cassandra_spark.operators.urls import url_dedup

    return url_dedup(df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    args = ap.parse_args()
    spark = get_spark()
    for n in (int(x) for x in args.factors.split(",")):
        tag = f"{n}x"
        df = hot_urls(spark, tag).localCheckpoint(eager=True)
        for name, fn in (("agg+joinback", shipped), ("window", window_strawman)):
            def run():
                t0 = time.time()
                fn(df).write.format("noop").mode("overwrite").save()
                return time.time() - t0
            w = run()
            floor = _max_stage_id(spark)
            t1, t2 = run(), run()
            rd, wr = _shuffle_bytes_since(spark, floor)
            print(
                f"RESULT {tag} {name}: warm={w:.1f}s min2={min(t1, t2):.1f}s"
                f" shuffle_read(2r)={rd/1e6:.1f}MB write={wr/1e6:.1f}MB",
                flush=True,
            )


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


if __name__ == "__main__":
    main()
