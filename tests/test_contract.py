"""Testdata schema contract — the one obvious place a regenerated
testdata drop fails, instead of 24 scattered query errors.

Round 3 shipped a silent contract break: events.ts changed from
parquet TIMESTAMP(NANOS) (long epoch nanos under nanosAsLong) to
timestamp[us] (TIMESTAMP_NTZ) and every downstream `ts DIV 1000000`
died at analysis.  These tests pin (a) the engine's canonical column
sets/types per table, and (b) that the ts_* normalization helpers
accept whatever encoding the current drop uses and agree with each
other.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from activity_classifier_spark_cassandra_spark.sources.io import (
    load_table,
    ts_event_time,
    ts_literal,
    ts_ms,
    ts_ticks,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# column -> set of acceptable Spark dtypes (the ts entry names every
# encoding the scan layer normalizes; anything else must fail HERE)
TS_ENCODINGS = {"timestamp", "timestamp_ntz", "bigint"}

EXPECTED = {
    "events": {
        "event_id": {"bigint"},
        "ts": TS_ENCODINGS,
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int", "bigint"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_quantity": {"double", "decimal(15,2)"},
        "l_extendedprice": {"double", "decimal(15,2)"},
        "l_discount": {"double", "decimal(15,2)"},
        "l_tax": {"double", "decimal(15,2)"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"date", "timestamp", "timestamp_ntz"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double", "decimal(15,2)"},
        "o_orderdate": {"date", "timestamp", "timestamp_ntz"},
        "o_orderpriority": {"string"},
    },
    "customer": {"c_custkey": {"bigint"}, "c_nationkey": {"int", "bigint"}},
    "supplier": {"s_suppkey": {"bigint"}, "s_nationkey": {"int", "bigint"}},
    "part": {"p_partkey": {"bigint"}},
    "nation": {
        "n_nationkey": {"int", "bigint"},
        "n_regionkey": {"int", "bigint"},
    },
    "region": {"r_regionkey": {"int", "bigint"}},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_contract(spark, table):
    df = load_table(spark, SF_DIR, table)
    dtypes = dict(df.dtypes)
    for col, accepted in EXPECTED[table].items():
        assert col in dtypes, (
            f"{table}.{col} missing — testdata drop changed the schema; "
            f"have {sorted(dtypes)}"
        )
        assert dtypes[col] in accepted, (
            f"{table}.{col} is {dtypes[col]}, engine supports {accepted} "
            "— extend the sources/io ts_* normalization first"
        )


def test_ts_helpers_agree(spark):
    """ts_ticks / ts_ms / ts_event_time are three views of one instant."""
    ev = load_table(spark, SF_DIR, "events")
    ticks, per_ms = ts_ticks(ev)
    row = (
        ev.select(
            ticks.alias("ticks"),
            ts_ms(ev).alias("ms"),
            F.unix_millis(ts_event_time(ev)).alias("evt_ms"),
        )
        .agg(
            F.sum(
                F.when(F.expr(f"ticks DIV {per_ms}") != F.col("ms"), 1)
                .otherwise(0)
            ).alias("bad_ticks"),
            F.sum(
                F.when(F.col("evt_ms") != F.col("ms"), 1).otherwise(0)
            ).alias("bad_evt"),
            F.min("ms").alias("lo"),
            F.max("ms").alias("hi"),
        )
        .first()
    )
    assert row.bad_ticks == 0 and row.bad_evt == 0
    # sanity: instants are modern dates, not unit-confused garbage
    assert 1_000_000_000_000 < row.lo <= row.hi < 4_000_000_000_000


def test_ts_literal_matches_ms(spark):
    """ts_literal(ms) compares against raw ts exactly like ts_ms >= ms
    (the pushdown rewrite's correctness condition)."""
    ev = load_table(spark, SF_DIR, "events")
    cut = ev.select(ts_ms(ev).alias("ms")).agg(
        F.expr("percentile_approx(ms, 0.5)")
    ).first()[0]
    direct = ev.filter(F.col("ts") >= ts_literal(ev, int(cut))).count()
    via_ms = ev.filter(ts_ms(ev) >= F.lit(int(cut))).count()
    assert direct == via_ms


def test_ts_helpers_legacy_long_nanos(spark):
    """The dual-encoding claim must stay true for the legacy encoding
    too (long of epoch nanoseconds), which no current testdata
    exercises: all four helpers agree on a synthetic long-nanos frame."""
    ms = 1_705_276_800_123  # 2024-01-15T00:00:00.123Z
    df = spark.createDataFrame(
        [(1, (ms - 1) * 1_000_000), (2, ms * 1_000_000)],
        "event_id long, ts long",
    )
    ticks, per_ms = ts_ticks(df)
    assert per_ms == 1_000_000
    rows = {
        r["event_id"]: r
        for r in df.select(
            "event_id",
            ts_ms(df).alias("ms"),
            F.unix_millis(ts_event_time(df)).alias("evt_ms"),
            (F.col("ts") >= ts_literal(df, ms)).alias("ge_cut"),
        ).collect()
    }
    assert rows[1]["ms"] == ms - 1 and rows[2]["ms"] == ms
    assert rows[1]["evt_ms"] == ms - 1 and rows[2]["evt_ms"] == ms
    assert not rows[1]["ge_cut"] and rows[2]["ge_cut"]


def test_ts_helpers_reject_unknown_encoding(spark):
    """A third physical encoding (e.g. string, or an int narrower than
    the nanos bigint) must fail at plan-build time — NOT fall through
    to the legacy-nanos branch and build a silently 1000x-off
    timeline."""
    import pytest

    for schema in ("event_id long, ts string", "event_id long, ts int"):
        df = spark.createDataFrame([], schema)
        for helper in (
            lambda d: ts_ticks(d),
            lambda d: ts_ms(d),
            lambda d: ts_event_time(d),
            lambda d: ts_literal(d, 0),
        ):
            with pytest.raises(ValueError, match="unknown ts encoding"):
                helper(df)


def test_ts_helpers_cross_encoding_property(spark):
    """Property: for ANY epoch instant (µs precision), the two physical
    encodings (timestamp[us] wall-clock UTC vs long epoch-nanos) must
    normalize to the SAME canonical values through every helper."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(
            min_value=1_000_000_000_000_000,  # 2001-09-09 in epoch µs
            max_value=3_000_000_000_000_000,  # 2065-01-24
        )
    )
    def check(us):
        naive = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        df_ts = spark.createDataFrame(
            [(naive,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
        )
        df_ns = spark.createDataFrame([(us * 1_000,)], "ts long")
        rows = []
        for df in (df_ts, df_ns):
            ticks, per_ms = ts_ticks(df)
            r = df.select(
                (ticks * F.lit(1_000_000 // per_ms)).alias("ns"),
                ts_ms(df).alias("ms"),
                F.unix_micros(ts_event_time(df)).alias("evt_us"),
            ).first()
            rows.append((r["ns"], r["ms"], r["evt_us"]))
        assert rows[0] == rows[1] == (us * 1_000, us // 1_000, us)

    check()

