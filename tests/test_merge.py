"""SCD1 keyed merge (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_spark.operators.merge import scd1_merge
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_scd1_merge_semantics(spark):
    cust = load_table(spark, SF_DIR, "customer")
    n = cust.count()
    mod = (cust.filter(F.col("c_custkey") % 7 == 0)
           .withColumn("c_mktsegment", F.lit("UPDATED")))
    ins = cust.filter(F.col("c_custkey") % 11 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 10_000_000)
    out = scd1_merge(cust, mod.unionByName(ins), "c_custkey")
    n_ins = ins.count()
    assert out.count() == n + n_ins
    # updates won
    assert out.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") < 10_000_000)
        & (F.col("c_mktsegment") != "UPDATED")).count() == 0
    # untouched rows identical to base
    base_rows = {tuple(r) for r in cust.filter(
        (F.col("c_custkey") % 7 != 0)).collect()}
    out_rows = {tuple(r) for r in out.filter(
        (F.col("c_custkey") % 7 != 0) & (F.col("c_custkey") < 10_000_000)
    ).collect()}
    assert base_rows == out_rows
    # keys unique after merge
    assert out.select("c_custkey").distinct().count() == out.count()


def test_scd1_merge_schema_mismatch_rejected(spark):
    cust = load_table(spark, SF_DIR, "customer")
    with pytest.raises(ValueError):
        scd1_merge(cust, cust.drop("c_name"), "c_custkey")
