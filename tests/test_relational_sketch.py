"""Sketch aggregates (q_approx_sketch): error bounds pinned against the
exact answers — the driver's rows-only check can't see values, so this
is the correctness gate for the approximate family."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


def test_sketches_within_error_bounds(spark):
    from activity_classifier_spark_cassandra_spark.plans.relational import approx_sketch_raw

    got = approx_sketch_raw(spark, SF_DIR).toPandas().set_index("l_returnflag")
    con = duckdb.connect()
    exact = con.execute(
        f"""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               quantile_cont(l_extendedprice, 0.5)  AS q50,
               quantile_cont(l_extendedprice, 0.95) AS q95,
               COUNT(*) AS n_rows
        FROM read_parquet('{SF_DIR}/lineitem.parquet')
        GROUP BY l_returnflag
        """
    ).df().set_index("l_returnflag")
    con.close()
    assert sorted(got.index) == sorted(exact.index)
    for flag in exact.index:
        e, g = exact.loc[flag], got.loc[flag]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(g["approx_orders"] - e["n_orders"]) <= 0.06 * e["n_orders"]
        q50, q95 = g["price_q50"], g["price_q95"]
        # GK sketch with accuracy 10000 on ~20k rows/group: near-exact;
        # allow 2% relative slack
        assert abs(q50 - e["q50"]) <= 0.02 * e["q50"]
        assert abs(q95 - e["q95"]) <= 0.02 * e["q95"]
        assert g["n_rows"] == e["n_rows"]


def test_gated_sketch_all_true(spark):
    """The driver-facing shape: every tolerance gate must come back
    TRUE (this is exactly what the oracle hash asserts)."""
    got = entrymod.queries()["q_approx_sketch"](spark, SF_DIR).toPandas()
    assert len(got) == 3
    assert got["hll_in_tolerance"].all()
    assert got["q50_in_tolerance"].all()
    assert got["q95_in_tolerance"].all()


@pytest.mark.parametrize("name", ["q_grouping_sets", "q_ntile_dist"])
def test_matches_duckdb_oracle(spark, name):
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    sdf = entrymod.queries()[name](spark, "/root/testdata/sf0.001").toPandas()
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, o, check_dtype=False, rtol=1e-9, atol=1e-9)
    con.close()
