"""Session path mining and PMI collocations: fixture semantics plus
the plan shapes the oracles can't pin."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import paths as P
from activity_classifier_spark_cassandra_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime.datetime(2024, 1, 1 + day, hour),
                user_id=u,
                event_type=t,
            )
            for i, (u, day, hour, t) in enumerate(rows)
        ]
    )


def test_session_paths_orders_and_groups_by_day(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 9, "view"),
            (1, 0, 10, "click"),
            (1, 0, 11, "buy"),
            (1, 1, 9, "view"),  # next day -> separate session
            (2, 0, 23, "view"),
        ],
    )
    got = {
        (r["user_id"], r["day"]): r["path"]
        for r in P.session_paths(ev).collect()
    }
    assert got[(1, 19723)] == "view>click>buy"
    assert got[(1, 19724)] == "view"
    assert got[(2, 19723)] == "view"


def test_session_paths_tie_breaks_on_event_id(spark):
    # two events at the SAME timestamp: order must follow event_id
    ev = _ev(spark, [(1, 0, 9, "b"), (1, 0, 9, "a")])
    [(path,)] = P.session_paths(ev).select("path").collect()
    assert path == "b>a"  # event_id 0 first


def test_session_paths_caps_length(spark):
    ev = _ev(spark, [(1, 0, h, f"e{h}") for h in range(12)])
    [(path,)] = P.session_paths(ev).select("path").collect()
    assert path.count(">") == P.MAX_PATH_LEN - 1


def test_session_paths_topk_plan(spark):
    plan = (
        P.q_session_paths(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pmi_known_value(spark):
    """Hand-computed pair counts on a fixed alternating corpus."""
    docs = spark.createDataFrame([Row(text="a b " * 10)])  # 20 tokens
    pairs = (
        T.skipgram_pairs(docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = {(r["w1"], r["w2"]): r["n"] for r in pairs}
    # tokens: a b a b ... (20).  distance1: (a,b)x10, (b,a)x9;
    # distance2: (a,a)x9, (b,b)x9
    assert n == {("a", "b"): 10, ("b", "a"): 9, ("a", "a"): 9, ("b", "b"): 9}


def test_pmi_min_count_and_order(spark):
    out = T.q_pmi_collocations(spark, SF_DIR).toPandas()
    assert (out["n_pair"] >= T.PMI_MIN_PAIR).all()
    assert len(out) <= T.PMI_TOP_K
    # rounded-PMI descending with (w1, w2) tie-break = total order
    keys = list(
        zip(-out["pmi"], out["w1"], out["w2"])
    )
    assert keys == sorted(keys)


def test_pmi_positive_for_attracted_pair(spark):
    """'a' and 'b' always adjacent -> PMI(a,b) must be positive
    (co-occurrence above the independence baseline)."""
    docs = spark.createDataFrame([Row(text="a b c d e f g h " * 5)])
    rows = T.skipgram_pairs(docs).groupBy("w1", "w2").count().collect()
    nab = {(r["w1"], r["w2"]): r["count"] for r in rows}[("a", "b")]
    toks = 40
    npairs = sum(r["count"] for r in rows)
    pmi = math.log((nab * toks * toks) / (npairs * 5 * 5))
    assert pmi > 0
