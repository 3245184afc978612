"""Fixed-point PageRank and skip-gram co-occurrence: hand-computed
fixtures plus the plan shapes the oracles can't pin."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators import graph as G
from activity_classifier_spark_cassandra_spark.operators import text as T

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------- pagerank
def test_pagerank_hand_computed_path(spark):
    """Path graph 1-2-3 (symmetric). Replays the integer recurrence in
    Python and demands bit-equality after 3 iterations."""
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 1), (2, 3), (3, 2)]]
    )
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(edges, iters=3).collect()
    }

    S, D = G.PR_SCALE, G.PR_DAMPING_PCT
    tele = (100 - D) * S // 100
    deg = {1: 1, 2: 2, 3: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    rank = {n: S for n in deg}
    for _ in range(3):
        contrib = {
            n: sum(rank[u] // deg[u] for u in nbrs[n]) for n in deg
        }
        rank = {n: tele + (D * contrib[n]) // 100 for n in deg}
    assert got == rank
    # middle of the path must outrank the endpoints
    assert got[2] > got[1] == got[3]


def test_pagerank_dangling_free_and_mass_bounded(spark):
    """The trade graph is symmetrized, so every node has out-edges;
    total fixed-point mass stays within teleport/damping bounds."""
    edges = G.trade_edges(spark, SF_DIR)
    out = G.pagerank_fixed_point(edges, iters=3)
    n, total, mx = out.agg(
        F.count(F.lit(1)), F.sum("rank"), F.max("rank")
    ).first()
    # per-node rank >= teleport; sum <= n * SCALE (mass only leaks
    # through integer truncation, never grows)
    assert total >= n * ((100 - G.PR_DAMPING_PCT) * G.PR_SCALE // 100)
    assert total <= n * G.PR_SCALE
    assert mx < n * G.PR_SCALE  # single node can't exceed total mass


def test_pagerank_directed_sink_gets_rank(spark):
    """A DIRECTED input's sink-only vertex must still receive a rank
    row (teleport + inbound mass), not silently vanish."""
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(edges, iters=3).collect()
    }
    S, D = G.PR_SCALE, G.PR_DAMPING_PCT
    tele = (100 - D) * S // 100
    # node 1 never receives mass: teleport only.  node 2 receives
    # node 1's full rank each round (deg(1)=1).
    r2 = tele + (D * S) // 100
    r2 = tele + (D * tele) // 100  # iter 2: node 1's rank is now tele
    assert got == {1: tele, 2: r2}


def test_pagerank_plan_no_cartesian_topk(spark):
    q = G.q_pagerank(spark, SF_DIR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------- skip-gram
def test_skipgram_window_and_counts(spark):
    docs = spark.createDataFrame([Row(text="a b c d")])
    got = {
        (r["w1"], r["w2"])
        for r in T.skipgram_pairs(docs, window=2).collect()
    }
    # distance 1: (a,b) (b,c) (c,d); distance 2: (a,c) (b,d)
    assert got == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}


def test_skipgram_counts_multiplicity(spark):
    docs = spark.createDataFrame([Row(text="x y x y")])
    out = {
        (r["w1"], r["w2"]): r["n"]
        for r in T.skipgram_pairs(docs, window=2)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # adjacent: (x,y) twice, (y,x) once; distance 2: (x,x), (y,y)
    assert out == {
        ("x", "y"): 2,
        ("y", "x"): 1,
        ("x", "x"): 1,
        ("y", "y"): 1,
    }


def test_skipgram_short_docs_no_rows(spark):
    docs = spark.createDataFrame([Row(text="solo"), Row(text="  ")])
    assert T.skipgram_pairs(docs, window=2).count() == 0


def test_skipgram_plan_no_join(spark):
    """Pairs are built row-local: the plan must contain no join at all
    before the count aggregate (the naive positional self-join shape
    re-shuffles the corpus by position)."""
    plan = (
        T.q_skipgram_pairs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
