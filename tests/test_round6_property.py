"""Randomized (seeded, deterministic) property tests for the round-6
operators: each Spark result is replayed by an independent pure-Python
model on adversarial random inputs — equal timestamps, delete/reinsert
churn, boundary-hugging values — far beyond what the hand fixtures pin."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from activity_classifier_spark_cassandra_spark.operators.cdc import upsert_with_deletes
from activity_classifier_spark_cassandra_spark.operators.sessions import (
    with_session_id,
    with_session_id_bucketed,
)
from activity_classifier_spark_cassandra_spark.operators.similarity import (
    int8_quantize,
)


def test_upsert_with_deletes_matches_python_replay(spark):
    """200 random changelog events over 12 keys with I/U/D churn: the
    compacted table must equal a per-key latest-version dict replay
    (tombstone wins drop the key, later reinserts resurrect it)."""
    rng = random.Random(606)
    rows = []
    version_of = {}
    for i in range(200):
        k = rng.randrange(12)
        op = rng.choice(["I", "U", "D"])
        v = f"v{i}"
        ver = version_of.get(k, -1) + rng.randrange(1, 3)
        version_of[k] = ver
        rows.append((k, v, ver, op))
    changes = spark.createDataFrame(
        rows, "k long, v string, version long, op string"
    )
    got = {
        r.k: (r.v, r.version)
        for r in upsert_with_deletes(changes, ["k"], "version", "op").collect()
    }
    # replay: highest version wins per key (versions are unique per key
    # by construction), D removes
    best: dict[int, tuple] = {}
    for k, v, ver, op in rows:
        if k not in best or ver > best[k][1]:
            best[k] = (v, ver, op)
    want = {k: (v, ver) for k, (v, ver, op) in best.items() if op != "D"}
    assert got == want


def test_bucketed_sessionizer_matches_plain_on_random_streams(spark):
    """400 random events over 6 keys with heavy timestamp collisions
    and three different bucket widths (including one SMALLER than the
    gap and one coprime to it): bucketed session ids == plain window
    ids row-for-row."""
    rng = random.Random(1606)
    gap = 50
    rows = [
        (rng.randrange(6), rng.randrange(0, 2000), i)  # many ts ties
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "u long, ts long, eid long")
    plain = with_session_id(
        df, keys=["u"], ts_col="ts", gap=gap, tiebreak=["eid"]
    )
    want = {(r.u, r.ts, r.eid): r.session_id for r in plain.collect()}
    for bucket in (17, 50, 303):
        bucketed = with_session_id_bucketed(
            df, keys=["u"], ts_col="ts", gap=gap, tiebreak=["eid"],
            bucket_ticks=bucket,
        )
        got = {(r.u, r.ts, r.eid): r.session_id for r in bucketed.collect()}
        assert got == want, f"bucket_ticks={bucket}"


def test_int8_quantize_matches_python_replay(spark):
    """60 random vectors (plus zero and max-boundary vectors): qval and
    scale replayed exactly in Python — floor(v/maxabs*127 + 0.5) with
    round(maxabs/127, 9)."""
    rng = random.Random(2606)
    vecs = [[rng.uniform(-2, 2) for _ in range(8)] for _ in range(60)]
    vecs.append([0.0] * 8)
    vecs.append([1.0, -1.0, 0.5, -0.5, 0.25, -0.25, 0.0, 1.0])
    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    got = {
        (r.vec_id, r.dim): (r.qval, r.scale)
        for r in int8_quantize(emb).collect()
    }
    for vid, v in enumerate(vecs):
        m = max(abs(x) for x in v)
        for d, x in enumerate(v, start=1):
            if m == 0.0:
                assert got[(vid, d)] == (0, 0.0)
            else:
                q = int(math.floor(x / m * 127.0 + 0.5))
                assert got[(vid, d)] == (q, round(m / 127.0, 9)), (vid, d)


def test_bpe_fold_matches_greedy_random_alphabet(spark):
    """Random token sequences over a 3-symbol alphabet, every ordered
    pair as the merge rule — the fold must equal the greedy scan on all
    of them (the exhaustive 2-symbol case lives in test_round6)."""
    from activity_classifier_spark_cassandra_spark.operators.text import (
        _BPE_MERGE_FOLD,
        _sql_str,
    )
    from tests.test_round6 import _greedy_merge

    rng = random.Random(3606)
    cases = [
        [rng.choice("abc") for _ in range(rng.randrange(0, 12))]
        for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id long, toks array<string>"
    )
    for a in "abc":
        for b in "abc":
            fold = _BPE_MERGE_FOLD.format(PA=_sql_str(a), PB=_sql_str(b))
            got = {
                r.id: list(r.m)
                for r in df.selectExpr("id", f"{fold} AS m").collect()
            }
            for i, toks in enumerate(cases):
                assert got[i] == _greedy_merge(toks, a, b), (a, b, toks)


def test_int8_search_ranking_matches_python_replay(spark):
    """q_knn_int8's quantized cosine and ranking replayed in Python on
    the sf0.001 embeddings (scales cancel → integer dots)."""
    from activity_classifier_spark_cassandra_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        q_knn_int8,
    )
    from activity_classifier_spark_cassandra_spark.sources.io import load_table

    emb = {
        r.vec_id: list(r.embedding)
        for r in load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def q8(v):
        m = max(abs(x) for x in v)
        if m == 0.0:
            return [0] * len(v)
        return [int(math.floor(x / m * 127.0 + 0.5)) for x in v]

    codes = {i: q8(v) for i, v in emb.items()}

    def cos_q(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return round(dot / (na * nb), 6)

    want = {}
    for qid in range(N_QUERIES):
        scored = sorted(
            (
                (-cos_q(codes[qid], codes[nid]), nid)
                for nid in emb
                if nid != qid
            ),
        )[:TOP_K]
        want[qid] = [(nid, -s) for s, nid in scored]

    rows = q_knn_int8(spark, "/root/testdata/sf0.001").collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine_q))
    assert got == want
