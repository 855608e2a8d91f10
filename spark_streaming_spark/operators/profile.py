"""Table profiling / data-quality gate: per-column statistics computed
in ONE pass — the audit a training-data pipeline runs on every corpus
drop before it is allowed downstream (row counts, null rates, distinct
cardinality, value hulls), and the measuring twin of schema contracts.

Spark-first shape: every metric is an aggregate expression, so the
whole profile is a SINGLE Aggregate over one scan — no per-column jobs,
no driver loop; long-form output (column, metric, value) so adding a
column never changes the schema. Distincts use exact count_distinct
here (the gate wants exact or nothing at audit time); swap in the
engine-exact HLL (operators/sketch.py) when approximate is acceptable.
Values are rendered to strings so one result schema carries numeric,
timestamp and text hulls alike — rendering rules are pinned so the
DuckDB oracle reproduces them byte-for-byte (BIGINT as digits, DOUBLE
via the repr contract, NULL as the literal 'null').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _render(col: F.Column) -> F.Column:
    """Deterministic string rendering shared with the oracle: casting
    to string in Spark and DuckDB agrees for BIGINT and DECIMAL;
    doubles are avoided upstream (hulls are cast before rendering)."""
    return F.coalesce(col.cast("string"), F.lit("null"))


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass long-form profile. For each column: n_null, n_distinct
    (exact, nulls excluded), min, max. Plus one (column='*',
    metric='n_rows') row. Columns: column, metric, value.

    Plan: a single Aggregate (partial + final) over one scan computes
    every cell; the long form comes from a map-only posexplode of the
    1-row aggregate — so profiling k columns costs one shuffle of ONE
    row, not k jobs. Doubles are quantized to DECIMAL(38,7) before
    min/max so the rendered hull is engine-identical."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        typ = dict(df.dtypes)[c]
        hull = F.col(c)
        if typ == "double" or typ == "float":
            hull = F.col(c).cast("decimal(38,7)")
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(hull).alias(f"__min_{c}"))
        aggs.append(F.max(hull).alias(f"__max_{c}"))
    one = df.agg(*aggs)
    cells = [
        F.struct(F.lit("*").alias("column"), F.lit("n_rows").alias("metric"),
                 _render(F.col("__n_rows")).alias("value"))
    ]
    for c in cols:
        for metric, src in (("n_null", f"__nn_{c}"), ("n_distinct", f"__nd_{c}"),
                            ("min", f"__min_{c}"), ("max", f"__max_{c}")):
            cells.append(F.struct(
                F.lit(c).alias("column"), F.lit(metric).alias("metric"),
                _render(F.col(src)).alias("value")))
    return (
        one.select(F.explode(F.array(*cells)).alias("cell"))
        .select("cell.column", "cell.metric", "cell.value")
    )
