"""Every queries() entry vs its DuckDB oracle — the driver's check, run
locally at sf0.001 for fast iteration (driver uses sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, ORACLES[name])


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"brand", "product", "click_count", "rank"}
