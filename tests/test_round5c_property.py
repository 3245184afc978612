"""Property-based checks (hypothesis) for the round-5c operators:
span dedup, weighted bottom-k sampling, and fixed-point PageRank each
compared against an exact pure-Python replay on ARBITRARY inputs —
the distributed plan must agree with the sequential definition
bit-for-bit, not just on the fixtures we thought of."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from activity_classifier_spark_cassandra_spark.operators import graph as G
from activity_classifier_spark_cassandra_spark.operators import sampling as SM
from activity_classifier_spark_cassandra_spark.operators import spans as SP

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------- span dedup
_docs_strategy = st.lists(
    st.lists(
        st.sampled_from("abcde"),  # tiny alphabet -> real collisions
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


def _py_span_report(token_lists, n):
    grams = {}  # gram -> list[(doc, pos)]
    for d, toks in enumerate(token_lists):
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), []).append((d, i + 1))
    dup_pos = {}  # doc -> sorted positions
    for occ in grams.values():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                dup_pos.setdefault(d, set()).add(p)
    out = {}
    for d, ps in dup_pos.items():
        ps = sorted(ps)
        covered = sum(
            min(n, (ps[i + 1] - ps[i]) if i + 1 < len(ps) else n)
            for i in range(len(ps))
        )
        out[d] = (len(ps), covered)
    return out


@settings(**_SETTINGS)
@given(token_lists=_docs_strategy)
def test_span_dedup_matches_sequential_replay(spark, token_lists):
    n = 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(token_lists)]
    )
    got = {
        r["doc_id"]: (r["dup_spans"], r["dup_tokens"])
        for r in SP.span_dedup_report(docs, n=n).collect()
    }
    assert got == _py_span_report(token_lists, n)


# --------------------------------------------- weighted bottom-k
def _py_priority(doc_id, n_chars):
    unit, cap, seed = (
        SM.TICKET_UNIT_CHARS,
        SM.MAX_TICKETS,
        SM.WEIGHTED_SEED,
    )
    tickets = min(max((n_chars + unit - 1) // unit, 1), cap)
    return min(
        int(
            hashlib.md5(
                f"{seed}|{doc_id}:{t}".encode()
            ).hexdigest()[:15],
            16,
        )
        for t in range(1, tickets + 1)
    )


@settings(**_SETTINGS)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
    )
)
def test_weighted_sample_matches_sequential_replay(spark, sizes):
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=s) for i, s in enumerate(sizes)]
    )
    k = 5
    got = [
        (r["doc_id"], r["priority"])
        for r in SM.weighted_sample_by_size(docs, k=k).collect()
    ]
    want = sorted(
        ((i, _py_priority(i, s)) for i, s in enumerate(sizes)),
        key=lambda t: (t[1], t[0]),
    )[:k]
    assert got == want


# ----------------------------------------------------- pagerank
_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(pairs=_edges_strategy)
def test_pagerank_matches_sequential_replay(spark, pairs):
    # symmetrize like trade_edges does, dedup multi-edges
    sym = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    edges = spark.createDataFrame([Row(src=a, dst=b) for a, b in sym])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixed_point(edges, iters=3).collect()
    }

    S, D = G.PR_SCALE, G.PR_DAMPING_PCT
    tele = (100 - D) * S // 100
    deg = {}
    inbound = {}
    for a, b in sym:
        deg[a] = deg.get(a, 0) + 1
        inbound.setdefault(b, []).append(a)
    rank = {n: S for n in deg}
    for _ in range(3):
        rank = {
            n: tele
            + (D * sum(rank[u] // deg[u] for u in inbound.get(n, [])))
            // 100
            for n in deg
        }
    assert got == rank
