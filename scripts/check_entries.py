"""Targeted driver-contract check: run named queries() entries against
their oracle_sql() at a given SF with the driver-exact comparator from
tests/conftest. Usage: python scripts/check_entries.py [sf_dir] name...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from spark_streaming_spark.session import get_spark  # noqa: E402
from spark_streaming_spark.sources.batch import TABLES  # noqa: E402
from conftest import _canon_pandas  # noqa: E402


def main():
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("check", shuffle_partitions=16)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name in names:
        fn = qs[name]
        sdf = fn(spark, sf)
        spdf = sdf.toPandas()
        if name not in os_:
            print(f"{name}: rows-only {len(spdf)}")
            continue
        dpdf = con.execute(os_[name]).df()
        if sorted(spdf.columns) != sorted(dpdf.columns):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(spdf.columns)} "
                  f"duck={sorted(dpdf.columns)}")
            bad += 1
            continue
        if len(spdf) != len(dpdf):
            print(f"{name}: ROWCOUNT MISMATCH {len(spdf)} vs {len(dpdf)}")
            bad += 1
            continue
        _, s_rows = _canon_pandas(spdf)
        _, d_rows = _canon_pandas(dpdf)
        mm = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        if mm:
            print(f"{name}: VALUE MISMATCH {len(mm)} rows; first: {mm[0]}")
            bad += 1
        else:
            print(f"{name}: MATCH ({len(spdf)} rows)")
    print(f"done: {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
