"""Shared Spark fixture: one local session for the whole suite."""

from __future__ import annotations

import pytest

from activity_classifier_spark_cassandra_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="actitracker-tests", master="local[4]", shuffle_partitions=4
    )
    yield s
    s.stop()
