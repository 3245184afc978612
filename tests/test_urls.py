"""URL canonicalization + URL-level first-occurrence dedup.

Hand-written canonicalization fixtures (the rules are the spec), the
dedup keep-first contract, and the plan shape (one exchange, no
window over the canonical-URL key)."""

from __future__ import annotations

from pyspark.sql import Row

from activity_classifier_spark_cassandra_spark.operators import urls as U

SF_DIR = "/root/testdata/sf0.001"


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [Row(doc_id=i, url=u) for i, u in enumerate(raw)]
    )
    out = U.canonicalize_urls(df).orderBy("doc_id").collect()
    return [r["canon_url"] for r in out]


def test_canonicalize_case_and_default_ports(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Site.COM:443/A/b",
            "http://www.site.com:80/A/b",
            "https://www.site.com:8443/A/b",  # non-default port kept
        ],
    )
    assert got[0] == "https://www.site.com/A/b"  # path case PRESERVED
    assert got[1] == "http://www.site.com/A/b"
    assert got[2] == "https://www.site.com:8443/A/b"


def test_canonicalize_fragment_and_tracking_params(spark):
    got = _canon(
        spark,
        [
            "https://s.com/p?utm_source=a&utm_medium=b#frag",
            "https://s.com/p?ref=tw&id=7",
            "https://s.com/p?fbclid=x&gclid=y&q=1",
            "https://s.com/p?refresh=1",  # 'refresh' is NOT 'ref'
        ],
    )
    assert got[0] == "https://s.com/p"
    assert got[1] == "https://s.com/p?id=7"
    assert got[2] == "https://s.com/p?q=1"
    assert got[3] == "https://s.com/p?refresh=1"


def test_canonicalize_param_order_and_dot_segments(spark):
    got = _canon(
        spark,
        [
            "https://s.com/a/b?z=9&a=1&m=5",
            "https://s.com/a/b?a=1&m=5&z=9",
            "https://s.com/./x/../a/b",
            "https://s.com/a/b/",
            "https://s.com/a/b///",
        ],
    )
    assert got[0] == got[1] == "https://s.com/a/b?a=1&m=5&z=9"
    assert got[2] == got[3] == got[4] == "https://s.com/a/b"


def test_canonicalize_multi_question_mark(spark):
    """RFC 3986 §3.4: the query is everything after the FIRST '?';
    later '?' characters are query data and must survive."""
    got = _canon(
        spark,
        [
            "https://s.com/p?a=1?b=2",
            "https://s.com/p?b=2&a=1?x=3",
            # a '?' INSIDE a value must not let a tracking-looking
            # suffix strip the real param it is glued to
            "https://s.com/p?b=2&a=1?utm_replay=1",
        ],
    )
    assert got[0] == "https://s.com/p?a=1?b=2"
    assert got[1] == "https://s.com/p?a=1?x=3&b=2"
    assert got[2] == "https://s.com/p?a=1?utm_replay=1&b=2"
    # and canonical forms are stable under re-canonicalization
    assert _canon(spark, got) == got


def test_canonicalize_nested_dot_segments(spark):
    """'/seg/../' resolution runs to a fixed point: nested parents
    fully resolve, dotted segment names resolve, and a '..' that
    climbs past the root is left alone (RFC 3986 §5.2.4)."""
    got = _canon(
        spark,
        [
            "https://s.com/a/b/../../c",
            "https://s.com/a/b/c/../../../d",
            "https://s.com/v1.2/../x",
            "https://s.com/a/../..",
            "https://s.com/./a/./b/../c",
            # terminal '/seg/..' — RFC-equivalent to the trailing-slash
            # form, so all three must land on the same canonical key
            "https://s.com/a/b/..",
            "https://s.com/a/b/../",
            "https://s.com/a/b/../..",
        ],
    )
    assert got[0] == "https://s.com/c"
    assert got[1] == "https://s.com/d"
    assert got[2] == "https://s.com/x"
    assert got[3] == "https://s.com/.."
    assert got[4] == "https://s.com/a/c"
    assert got[5] == got[6] == "https://s.com/a"
    assert got[7] == "https://s.com"
    assert _canon(spark, got) == got


def test_url_dedup_keeps_lowest_doc_id(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=10, url="https://s.com/p?utm_source=x"),
            Row(doc_id=3, url="HTTPS://S.COM:443/p"),
            Row(doc_id=7, url="https://s.com/p#top"),
            Row(doc_id=5, url="https://s.com/other"),
        ]
    )
    out = {r["doc_id"]: r["keep"] for r in U.url_dedup(df).collect()}
    assert out == {3: True, 7: False, 10: False, 5: True}


def test_q_url_dedup_contract(spark):
    """Every doc appears exactly once; exactly one keep per canonical
    URL, and it is the minimum doc_id of its group."""
    df = U.q_url_dedup(spark, SF_DIR).toPandas()
    assert df.doc_id.is_unique
    g = df.groupby("canon_url")
    assert (g.keep.sum() == 1).all()
    kept = df[df.keep].set_index("canon_url").doc_id
    assert (g.doc_id.min() == kept.loc[g.doc_id.min().index]).all()


def test_url_dedup_hybrid_plan_shape(spark):
    """No hot keys detected -> the plan IS the plain one-pass window
    (empty IN-list folds to false, hot subtrees pruned: no join, no
    second aggregate).  With a forced hot key -> the corpus still
    shuffles ONCE (the salted window exchange); the hot-minima branch
    is a map-side-combining aggregate whose exchange carries only
    metadata, broadcast back.  Never a cartesian."""
    plan = (
        U.q_url_dedup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "BroadcastHashJoin" not in plan  # hot subtrees pruned
    assert "CartesianProduct" not in plan

    from activity_classifier_spark_cassandra_spark.sources.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    hot_plan = (
        U.url_dedup_hybrid(
            U.with_synthetic_urls(docs),
            hot_keys=["https://hot.example.com/boilerplate"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert hot_plan.count("Window") == 1
    # exactly two hash exchanges: the salted corpus window + the
    # metadata-sized hot-minima aggregate (never a second full
    # corpus shuffle, never a window over the unsalted hot key)
    assert hot_plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in hot_plan  # metadata join-back
    assert "CartesianProduct" not in hot_plan


def test_url_dedup_hybrid_matches_agg_any_routing(spark):
    """Routing cannot change values: hybrid == agg shape with (a) the
    default sampled detection, (b) a FORCED hot key exercising the
    salted path, (c) every key forced hot."""
    rows = [
        Row(doc_id=i, url=u)
        for i, u in enumerate(
            [
                "https://hot.example.com/boilerplate?utm_source=x",
                "https://hot.example.com/boilerplate?utm_source=y",
                "HTTPS://HOT.Example.COM:443/boilerplate",
                "https://s.com/p?b=2&a=1",
                "https://s.com/p?a=1&b=2#frag",
                "https://s.com/other",
            ]
        )
    ]
    df = spark.createDataFrame(rows)
    want = (
        U.url_dedup(df)
        .select("doc_id", "canon_url", "keep")
        .orderBy("doc_id")
        .collect()
    )
    all_keys = [
        r["canon_url"]
        for r in U.canonicalize_urls(df)
        .select("canon_url")
        .distinct()
        .collect()
    ]
    for hk in (
        None,
        ["https://hot.example.com/boilerplate"],
        all_keys,
    ):
        got = (
            U.url_dedup_hybrid(df, hot_keys=hk)
            .select("doc_id", "canon_url", "keep")
            .orderBy("doc_id")
            .collect()
        )
        assert got == want


def test_canonicalize_is_idempotent_and_normal(spark):
    """Property: canon(canon(u)) == canon(u) on randomized URLs built
    from the hazard grammar, and every canonical form is normal (no
    fragment, no default port, no tracking params, params sorted, no
    trailing slash)."""
    import random

    rng = random.Random(414)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["A.example.COM", "www.site.org", "S3.Example.com:443",
             "host.net:80", "host.net:8080"]
    paths = ["", "/", "/a/b", "/a/b/", "/./a/../a/b", "/x/y///",
             "/a/b/../../c", "/v1.2/../x", "/p/q/r/../../../s",
             "/a/../.."]
    queries = ["", "?utm_source=x", "?b=2&a=1", "?ref=tw&id=3&a=1",
               "?fbclid=1&z=9&m=2", "?a=1?b=2", "?b=2&a=1?u=3"]
    frags = ["", "#top", "#a/b?c=1"]
    raw = [
        f"{rng.choice(schemes)}://{rng.choice(hosts)}"
        f"{rng.choice(paths)}{rng.choice(queries)}{rng.choice(frags)}"
        for _ in range(200)
    ]
    once = _canon(spark, raw)
    twice = _canon(spark, once)
    assert once == twice
    for c in once:
        assert "#" not in c
        assert not c.startswith("HTTP")
        scheme, rest = c.split("://", 1)
        host = rest.split("/", 1)[0].split("?")[0]
        if scheme == "https":
            assert not host.endswith(":443"), c
        if scheme == "http":
            assert not host.endswith(":80"), c
        if "?" in c:
            q = c.split("?", 1)[1]
            parts = q.split("&")
            assert parts == sorted(parts), c
            assert not any(
                p.startswith(("utm_", "ref=", "fbclid=", "gclid="))
                for p in parts
            ), c
        base = c.split("?")[0]
        path = base.split("://", 1)[1]
        path = path[path.find("/"):] if "/" in path else ""
        assert not path.endswith("/") or path == "", c
        assert "/./" not in path, c
