"""Property-based checks for the last round-5 operators: the epoch
shuffle order and per-label centroids, replayed sequentially in
Python on arbitrary inputs."""

from __future__ import annotations

import hashlib
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from activity_classifier_spark_cassandra_spark.operators import shuffle as SH
from activity_classifier_spark_cassandra_spark.operators import (
    similarity as SIM,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_key(doc_id: int, epoch: int) -> int:
    return int(
        hashlib.md5(f"{epoch}|{doc_id}".encode()).hexdigest()[:15], 16
    )


@settings(**_SETTINGS)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    epoch=st.integers(min_value=0, max_value=50),
)
def test_shuffle_key_matches_md5_replay(spark, ids, epoch):
    df = spark.createDataFrame([Row(doc_id=i) for i in ids])
    got = [
        r["doc_id"]
        for r in df.select(
            "doc_id", SH.shuffle_key(df.doc_id, epoch).alias("k")
        )
        .orderBy("k", "doc_id")
        .collect()
    ]
    want = sorted(ids, key=lambda i: (_py_key(i, epoch), i))
    assert got == want


_vectors = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.lists(
            st.floats(
                min_value=-5,
                max_value=5,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=3,
            max_size=3,
        ),
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(vecs=_vectors)
def test_label_centroids_match_decimal_replay(spark, vecs):
    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=v, label=lb)
            for i, (lb, v) in enumerate(vecs)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r["label"], r["dim"]): (r["n_vectors"], r["centroid"])
        for r in SIM.label_centroids(emb).collect()
    }

    # replay: float32 -> double -> DECIMAL(38,18) sums (exact), then
    # one double division and round
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    sums: dict[tuple, list] = {}
    for lb, v in vecs:
        for d, x in enumerate(v, start=1):
            s = sums.setdefault((lb, d), [0, Decimal(0)])
            s[0] += 1
            s[1] += Decimal(repr(f32(x))).quantize(Decimal("1e-18"))
    for k, (n, sv) in sums.items():
        gn, gc = got[k]
        assert gn == n
        assert abs(gc - round(float(sv) / n, 6)) <= 1e-6
