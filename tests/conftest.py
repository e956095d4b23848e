"""Shared fixtures: one SparkSession and one DuckDB connection per test run.

Tests compare the Spark inventory queries against the DuckDB oracle at
sf0.001 (fast), mirroring what the driver does at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from sql_query_optimizer_cpp_spark.catalog import TABLES, table_path
from sql_query_optimizer_cpp_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        app_name="tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()
