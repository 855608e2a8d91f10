"""Vector math over array<float> columns — JVM higher-order functions.

Engine-identical arithmetic contract (mirrored in every DuckDB oracle):

    dot(a, b)  = Σ decimal38_8( round( double(a_i) * double(b_i), 7 ) )
    cosine     = double(dot(a,b)) / ( sqrt(double(dot(a,a))) *
                                      sqrt(double(dot(b,b))) )

Rounding each product to 7 dp then summing as DECIMAL(38,8) makes the sum
exact and associative → order-independent (shuffle/partitioning cannot
change the result) and identical across engines that share IEEE-754
doubles. The 7-dp quantization costs ~1e-7 absolute per element — far
below any similarity threshold in use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ZERO = "cast(0 as decimal(38,8))"


def _dot_expr(a: str, b: str) -> Column:
    """Decimal-exact dot product of two array<float> columns (as double)."""
    # the merge lambda must return exactly the zero's type, so re-cast:
    # decimal(38,8) + decimal(38,8) would widen to decimal(38,7)
    return F.expr(
        f"cast(aggregate(zip_with({a}, {b}, (x, y) ->"
        f" cast(round(cast(x as double) * cast(y as double), 7)"
        f" as decimal(38,8))), {_ZERO},"
        f" (acc, v) -> cast(acc + v as decimal(38,8))) as double)"
    )


def norm2_expr(a: str) -> Column:
    """Squared L2 norm (decimal-exact, as double)."""
    return _dot_expr(a, a)


def dot_expr(a: str, b: str) -> Column:
    """Public decimal-exact dot product (as double)."""
    return _dot_expr(a, b)


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity with the engine-identical arithmetic contract.

    NOTE for pair joins: this recomputes both norms per PAIR — fine
    against a broadcast 1-row side, wasteful inside an N×N bucket join.
    There, precompute ``sqrt(norm2_expr(...))`` per VECTOR before the
    join and divide by the product of the stored norms
    (operators/similarity.py does this); the value is bitwise identical
    because each norm is a per-vector decimal sum either way."""
    return _dot_expr(a, b) / (F.sqrt(_dot_expr(a, a)) * F.sqrt(_dot_expr(b, b)))


# --- scaled-integer contract (the cheap exact variant) ----------------------
#
# For HOT all-pairs paths (kNN joins) the BigDecimal accumulation above is
# the bottleneck: every product allocates and rounds a JVM BigDecimal.
# Quantizing each ELEMENT once to a 1e-7-step BIGINT and doing the whole
# dot in 64-bit integer arithmetic is ~10x faster and equally
# deterministic (integer ops are exact and associative; both engines
# share them bit-for-bit). Bound: |x| <= 92 per element at 64 dims
# (1e7-scaled products sum to < 2^63). The two contracts differ in WHERE
# the 7-dp rounding lands (element vs product) — numerically ~1e-7 apart;
# each operator declares which contract its oracle mirrors.

SCALED_VEC_SQL = (
    "transform({v}, x -> cast(round(cast(x as double) * 10000000.0)"
    " as bigint))"
)

_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)


def scaled_vec_expr(v: str) -> Column:
    """array<float> -> array<bigint>, each element rounded to 1e-7 steps."""
    return F.expr(SCALED_VEC_SQL.format(v=v))


def int_dot_expr(a: str, b: str) -> Column:
    """Integer-exact dot of two pre-scaled BIGINT vector columns (see
    :func:`scaled_vec_expr`). Returns BIGINT (scale 1e14)."""
    return F.expr(_IDOT.format(a=a, b=b))


def int_cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from scaled-integer dot and squared norms — the 1e14
    scales cancel; the doubles division/sqrt are IEEE-deterministic."""
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


SQL_COSINE_FN = "cosine_sim"


def register_sql_cosine(spark) -> None:
    """SQL-callable ``cosine_sim(a, b)`` — SURVEY §4.3's one 'revisit'
    item, closed WITHOUT a Python UDF: a DECLARATIVE SQL function
    (``CREATE FUNCTION … RETURN expr``, Spark 4) whose body is built
    from the same ``SCALED_VEC_SQL`` / integer-dot templates as the
    DataFrame operators, so it inlines into the caller's plan, stays in
    whole-stage codegen, and computes the identical engine-exact value.

    Convenience surface for ad-hoc SQL: the body re-scales each argument
    per call (three template expansions), so HOT pair joins should keep
    staging scaled vectors + norms before the join as the similarity
    operators do — this is for the analyst writing plain SQL, not the
    inner loop."""
    sa = SCALED_VEC_SQL.format(v="a")
    sb = SCALED_VEC_SQL.format(v="b")
    dot = _IDOT.format(a=sa, b=sb)
    na = _IDOT.format(a=sa, b=sa)
    nb = _IDOT.format(a=sb, b=sb)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {SQL_COSINE_FN}"
        f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
        f"cast({dot} as double) / (sqrt(cast({na} as double))"
        f" * sqrt(cast({nb} as double)))"
    )
