"""SparkSession factory.

One builder for the whole engine: AQE on (runtime re-planning +
skew-join handling), Arrow on (Pandas-UDF fast path), UTC timezone
(parity with the DuckDB oracle, whose timestamps are UTC-naive),
shuffle partitions sized for the local-mode test box.  On a real
cluster the same code runs with ``master``/memory supplied by
spark-submit; nothing here is local-mode-specific except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "activity_classifier_spark_cassandra_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Older testdata generations store events.ts as TIMESTAMP(NANOS),
        # which Spark 4 rejects by default; accept it as a long of epoch
        # nanoseconds.  Current drops use timestamp[us].  Either way the
        # sources/io ts_* helpers normalize at the scan — nothing else
        # may assume a unit.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pin the warehouse next to the package so managed tables land
        # in the same place regardless of the calling process's cwd
        # (sources.io.warehouse_dir / managed_table_path resolve this
        # same conf — one source of truth for the on-disk layout).
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "spark-warehouse",
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
