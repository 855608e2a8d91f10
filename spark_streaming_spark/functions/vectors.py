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
