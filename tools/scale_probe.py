"""100x scale probe for the flagship and span-dedup plans.

Extends the 10x duplication protocol (BASELINE.md, rounds 5/5c/5d) to
100x, plus a deliberately skewed variant of the events table:

* events Nx: each copy shifts user_id by 1_000_000 so key ranges stay
  disjoint and per-key session structure is identical to 1x.
* documents Nx: each copy shifts doc_id by 10_000_000 and tags every
  token with the copy id, so the CROSS-document duplicate rate (what
  span dedup measures) stays at its 1x level instead of inflating Nx.
* skew variant: >=20% of all event rows are remapped onto ONE hot
  (user_id=777, event_type='walk') key — the adversarial shape for the
  flagship's per-key ordered sessionization window.

Metrics per run: wall seconds (min of two warm runs) and total shuffle
read/write bytes, pulled from the local UI REST API for exactly the
stages the run executed.

Usage:
    python tools/scale_probe.py [--factors 1,10,100] [--skew]
                                [--sf /root/testdata/sf0.1]
Writes generated tables under /tmp/scaleprobe/<tag>/ and prints a
markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BASE = "/tmp/scaleprobe"
HOT_USER, HOT_EVENT = 777, "walk"


def get_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        # 8g, matching session.get_spark: a 100g local-mode heap lets
        # the collector balloon instead of collecting young garbage on
        # allocation-heavy (explode/md5) plans — measured 196s vs 27s
        # cold on the same 27M-row query, page-zeroing dominated.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


# ------------------------------------------------------------- generate
def gen_events(spark, sf, n, out, skew=False):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    d = ev.withColumn("copy", F.explode(F.expr(f"sequence(0, {n - 1})")))
    d = (
        d.withColumn(
            "user_id",
            (F.col("user_id") + F.col("copy").cast("long") * 1_000_000).cast("long"),
        )
        # event_id must stay unique across copies BEFORE the hot-key
        # remap: otherwise the hot key holds duplicate (ts, event_id)
        # pairs, the sessionization tiebreak is not a total order, and
        # the probed plan's measured work is nondeterministic on
        # exactly the key the probe targets
        .withColumn(
            "event_id",
            (F.col("event_id") + F.col("copy").cast("long") * 1_000_000_000).cast("long"),
        )
        .drop("copy")
    )
    if skew:
        # >=20% of ALL rows onto one hot key; md5 threshold '33' ~ 20%
        hot = F.md5(F.col("event_id").cast("string")) < "33"
        d = d.withColumn(
            "user_id", F.when(hot, F.lit(HOT_USER)).otherwise(F.col("user_id"))
        ).withColumn(
            "event_type",
            F.when(hot, F.lit(HOT_EVENT)).otherwise(F.col("event_type")),
        )
    # many files, like real scaled input — a single exploded file would
    # serialize the scan into one split and measure nothing but that
    d.repartition(max(8, 2 * n)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )


def gen_documents(spark, sf, n, out):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    d = docs.withColumn("copy", F.explode(F.expr(f"sequence(0, {n - 1})")))
    d = (
        d.withColumn(
            "doc_id", (F.col("doc_id") + F.col("copy").cast("long") * 10_000_000).cast("long")
        )
        .withColumn(
            "text",
            F.expr(
                "array_join(transform(filter(split(text, '\\\\s+'),"
                " x -> x != ''), t -> concat(t, '#', copy)), ' ')"
            ),
        )
        .drop("copy")
    )
    d.repartition(max(8, 2 * n)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )


def gen_embeddings(spark, sf, n, out):
    """Nx corpus, same query set: copies shift vec_id above N_QUERIES so
    the probe measures index build + search over an Nx corpus for the
    SAME queries — the realistic ANN scale-up axis."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    d = emb.withColumn("copy", F.explode(F.expr(f"sequence(0, {n - 1})")))
    d = d.withColumn(
        "vec_id", (F.col("vec_id") + F.col("copy").cast("long") * 1_000_000).cast("long")
    ).drop("copy")
    d.repartition(max(8, 2 * n)).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )


def gen_orders(spark, sf, n, out):
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    d = orders.withColumn("copy", F.explode(F.expr(f"sequence(0, {n - 1})")))
    d = d.withColumn(
        "o_orderkey",
        (F.col("o_orderkey") + F.col("copy").cast("long") * 100_000_000).cast("long"),
    ).drop("copy")
    d.repartition(max(8, 2 * n)).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )


# ------------------------------------------------------------- metrics
def _ui(spark, path):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _max_stage_id(spark):
    st = _ui(spark, "stages")
    return max((s["stageId"] for s in st), default=-1)


def _shuffle_bytes_since(spark, stage_floor):
    st = _ui(spark, "stages?status=complete")
    w = sum(s["shuffleWriteBytes"] for s in st if s["stageId"] > stage_floor)
    r = sum(s["shuffleReadBytes"] for s in st if s["stageId"] > stage_floor)
    return r, w


def timed(spark, fn, runs=2):
    """One untimed warm-up (codegen JIT dominates the cold run by up
    to 4x, measured) then min-of-N wall; shuffle bytes of the LAST
    run.  Timing executes the FULL plan into the noop sink (same as
    bench.py) — a ``count()`` here lets Catalyst eliminate whole
    subtrees whose row count is derivable (measured: a row-preserving
    LEFT JOIN apply pass collapsed to a bare parquet count, 0.5s flat
    at 100x); rows are counted once, untimed, for the report."""
    fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        floor = _max_stage_id(spark)
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    rd, wr = _shuffle_bytes_since(spark, floor)
    n = fn().count()
    return best, n, rd, wr


# ------------------------------------------------------------- probes
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--queries",
        default="q_session_features,q_span_dedup",
        help="comma list; the probe generates every table they need",
    )
    ap.add_argument(
        "--tables",
        default="events,documents,embeddings,orders",
        help="comma list of tables to generate (skip 100x generation"
        " cost for tables the probed queries never read)",
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    probe_queries = args.queries.split(",")

    spark = get_spark()
    import __spark_entry__ as E

    qs = E.queries()
    rows = []
    for n in factors:
        tag = f"{n}x"
        out = f"{BASE}/{tag}"
        gen = {
            "events": gen_events,
            "documents": gen_documents,
            "embeddings": gen_embeddings,
            "orders": gen_orders,
        }
        if not args.skip_gen:
            for t in args.tables.split(","):
                gen[t](spark, args.sf, n, out)
        for qname in probe_queries:
            wall, cnt, rd, wr = timed(
                spark, lambda q=qname, o=out: qs[q](spark, o)
            )
            rows.append((qname, tag, wall, cnt, rd, wr))
            print(
                f"{qname} @ {tag}: {wall:.2f}s rows={cnt} "
                f"shuffle_read={rd / 1e6:.1f}MB write={wr / 1e6:.1f}MB",
                flush=True,
            )
        if args.skew and n == max(factors):
            out_sk = f"{BASE}/{tag}_skew"
            if not args.skip_gen:
                gen_events(spark, args.sf, n, out_sk, skew=True)
                link = f"{out_sk}/documents.parquet"
                if os.path.islink(link):
                    os.remove(link)
                os.symlink(
                    os.path.abspath(f"{out}/documents.parquet"), link
                )
            wall, cnt, rd, wr = timed(
                spark, lambda o=out_sk: qs["q_session_features"](spark, o)
            )
            rows.append(("q_session_features", f"{tag}+skew", wall, cnt, rd, wr))
            print(
                f"q_session_features @ {tag}+skew (hot key >=20%): "
                f"{wall:.2f}s rows={cnt} "
                f"shuffle_read={rd / 1e6:.1f}MB write={wr / 1e6:.1f}MB",
                flush=True,
            )

    print("\n| query | scale | wall (min of 2) | rows | shuffle read | shuffle write |")
    print("|---|---|---|---|---|---|")
    for q, tag, wall, cnt, rd, wr in rows:
        print(
            f"| {q} | {tag} | {wall:.2f}s | {cnt} "
            f"| {rd / 1e6:.1f} MB | {wr / 1e6:.1f} MB |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
