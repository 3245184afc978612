"""Grouped-aggregate Pandas UDF (UDAF surface, SURVEY §2.11).

The reference has no UDF/UDAF surface (its "custom aggregates" are
driver-side Java loops); here the contract is exercised with a
GROUPED_AGG pandas UDF — Arrow ships each group's column to Python
once, the function returns one scalar, and Spark treats it as a
first-class aggregate expression (mixable with built-ins in the same
``agg``).

Caveat this module exists to document: a GROUPED_AGG UDF has **no
partial aggregation** — every raw value of a group crosses the wire to
one Python worker, so a hot key concentrates its whole group (contrast
built-ins, which combine map-side).  That is the price of arbitrary
Python; keep it off 100 TB hot paths unless the group sizes are
bounded (as the per-event-type groups here are per-partition-bounded
after the events shuffle), or pre-aggregate the reduction's algebraic
part with built-ins first.

The demonstration aggregate is the geometric mean of positive values —
chosen because the DuckDB oracle can state it exactly
(EXP(AVG(LN(v)))), so the Python path is value-checked, not just
shape-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.io import load_table


# DataType object, not a DDL string: the string form is parsed through
# the active SparkContext at decoration time, which breaks importing
# this module before a session exists (the driver imports the registry
# first).
@F.pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    pos = v[v > 0]
    if len(pos) == 0:
        return None
    return float(np.exp(np.log(pos.to_numpy()).mean()))


def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF over events, joined to the built-in aggregates of
    the same grouping (Spark disallows mixing GROUPED_AGG pandas UDFs
    with JVM aggregates in one ``agg`` — INVALID_PANDAS_UDF_PLACEMENT —
    so the two passes share the exchange and join on the tiny group
    key)."""
    ev = load_table(spark, sf_dir, "events")
    custom = ev.groupBy("event_type").agg(
        F.round(geometric_mean("value"), 6).alias("geo_value")
    )
    builtin = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
    )
    return custom.join(builtin, "event_type")


PANDAS_UDAF_SQL = """
SELECT event_type,
       -- CASE, not FILTER: DuckDB evaluates the aggregate argument
       -- before applying FILTER, so LN(value) raises on a value of 0
       -- (first appears at sf0.1); AVG skips the CASE's NULLs, which
       -- is the same positive-only semantics as the pandas UDF.
       ROUND(EXP(AVG(CASE WHEN value > 0 THEN LN(value) END)), 6)
         AS geo_value,
       COUNT(*) AS n,
       ROUND(AVG(value), 6) AS mean_value
FROM events
GROUP BY event_type
"""
