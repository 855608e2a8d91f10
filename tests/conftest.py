"""Shared fixtures: one SparkSession, one DuckDB connection with the driver
tables as views, and an oracle-comparison helper mirroring the driver's
check (row-count + schema-names + order-insensitive value compare)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from spark_streaming_spark.session import get_spark
from spark_streaming_spark.sources.batch import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr: we design queries so both engines agree bitwise
        return repr(v)
    return str(v)


def _norm_rows(cols, rows):
    """Sort columns by name (driver contract), then rows lexicographically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def assert_matches_oracle(spark_df, duck_con, sql):
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_cols, s_rows = _norm_rows(spark_cols, spark_rows)
    d_cols, d_rows = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, (
        f"value mismatch ({len(mismatches)} rows); first 5: {mismatches[:5]}"
    )
