"""Set operations + scalar-function surface (SURVEY.md §2.7/§2.8).

The reference documents only receiver-stream union
(``/root/reference/README.md:941-950``); we expose the full relational
set-op surface (UNION/UNION ALL/INTERSECT/EXCEPT) plus the scalar
functions its pipelines used (split/element extract/concat — §2.8) and the
JSON path functions justified by the events.props column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_streaming_spark.functions.numeric import dsum


def nation_presence(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """UNION ALL with source tags: nation keys present among customers and
    suppliers. Columns: side, nationkey, cnt."""
    c = customer.select(F.lit("customer").alias("side"),
                        F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.lit("supplier").alias("side"),
                        F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("side", "nationkey").agg(
        F.count("*").alias("cnt")
    )


def nations_in_both(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """INTERSECT: nation keys with both customers and suppliers."""
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
    )


def nations_customers_only(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """EXCEPT (distinct): nation keys with customers but no suppliers.
    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would keep keys
    whose customer multiplicity merely exceeds supplier multiplicity)."""
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(supplier.select(F.col("s_nationkey").alias("nationkey")))
    )


def day_clickers_no_purchase(events: DataFrame,
                             day: str = "2024-01-01") -> DataFrame:
    """EXCEPT (distinct) with a non-empty result at every SF: users who
    clicked on ``day`` but purchased nothing that day — conversion-gap
    cohort. (The nation-level EXCEPT above is the same operator shape but
    happens to be empty on the driver data — a vacuous oracle check; this
    one actually exercises the subtract path.) Columns: user_id."""
    on_day = events.filter(F.to_date("ts") == day)
    clickers = on_day.filter(F.col("event_type") == "click").select("user_id")
    purchasers = on_day.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.subtract(purchasers)


def small_parts_ordered(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """EXCEPT with guaranteed-non-empty result at every SF: part keys that
    appear in lineitem minus the large parts (p_size > 25).
    Column: partkey."""
    return (
        lineitem.select(F.col("l_partkey").alias("partkey")).distinct()
        .subtract(part.filter(F.col("p_size") > 25)
                  .select(F.col("p_partkey").alias("partkey")))
    )


def scalar_showcase(events: DataFrame) -> DataFrame:
    """The reference's scalar surface (split / element_at / concat_ws —
    §2.8) + string/date/math built-ins, all JVM-side Column exprs.
    Columns: event_id, etype_upper, first3, tagged, day, yr, mon,
    val_rounded, val_abs."""
    return events.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.substring("event_type", 1, 3).alias("first3"),
        F.concat_ws("_", "event_type", F.col("user_id").cast("string")).alias("tagged"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mon"),
        F.round(F.col("value"), 1).alias("val_rounded"),
        F.abs(F.col("value")).alias("val_abs"),
    )


def json_props_rollup(events: DataFrame) -> DataFrame:
    """JSON path extraction over events.props ('{"k": int}') + keyed agg.
    Columns: k, cnt, sum_value."""
    k = F.get_json_object("props", "$.k").cast("int").alias("k")
    return (
        events.select(k, "value")
        .groupBy("k")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
    )
