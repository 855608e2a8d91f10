"""Oracle-stable numeric aggregation helpers.

Problem: ``SUM(double)`` is order-dependent, so Spark (parallel, shuffled)
and an external oracle (DuckDB) can disagree in the last ulps — and Spark
can even disagree with itself run-to-run. At 100 TB that's also a real
reproducibility concern for pipeline audits.

Solution used across this engine: quantize each addend to a fixed-point
decimal *before* summation. Decimal sums are exact and associative, so the
result is order-independent and engine-identical; the final cast back to
double is a single deterministic conversion both engines share.

The matching DuckDB SQL spellings live next to each query in
``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale choices: 2 dp matches the money-ish TPC-H columns; products of two
# money columns get 4 dp; per-element vector products get 7 dp (see
# functions/vectors.py). Precision 38 (max) so 100 TB-scale sums can't
# overflow: 1e12 rows * 1e6 magnitude = 1e18 << 1e(38-scale).
DEC2 = "decimal(38,2)"
DEC4 = "decimal(38,4)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: quantize to decimal(38,scale), sum exactly,
    return double.  DuckDB oracle spelling:
    ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG as exact-decimal-sum / count, divided in
    double.  DuckDB: ``CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE) /
    COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(c)
