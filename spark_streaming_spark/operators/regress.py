"""Distributed ordinary least squares by NORMAL EQUATIONS — the way
MLlib's own LinearRegression "normal" solver works (public method;
X'X / X'y sufficient statistics + a driver-sized solve), expressed
engine-exactly: one partial-agged aggregate builds the exact integer
moment row, and the 3×3 solve is Cramer's rule over doubles of those
exact moments in a FIXED IEEE expression tree.

The fixed tree is guaranteed identical cross-engine by construction:
the expression STRING is generated once (:func:`_ols_tail_exprs`) and
pasted into both the Spark plan (``F.expr``) and the DuckDB oracle —
same association, same correctly-rounded IEEE ops, bit-identical
coefficients.

Scale shape: ONE scan, ONE 10-cell aggregate (map-side combinable),
everything after is a 1-row computation. This is the canonical
100 TB regression plan — no gradient loop, no per-row Python, no
second pass for R².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact integer feature encodings (the house quantization contract):
# y = price cents, x1 = quantity in 1e-2 units, x2 = discount in 1e-4
_Y = "CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * 100 AS BIGINT)"
_X1 = "CAST(CAST(l_quantity AS DECIMAL(38,2)) * 100 AS BIGINT)"
_X2 = "CAST(CAST(l_discount AS DECIMAL(38,4)) * 10000 AS BIGINT)"

_MOMENTS = {
    "n": "COUNT(*)",
    "s1": "SUM(CAST(x1 AS DECIMAL(38,0)))",
    "s2": "SUM(CAST(x2 AS DECIMAL(38,0)))",
    "s11": "SUM(CAST(x1 AS DECIMAL(38,0)) * x1)",
    "s12": "SUM(CAST(x1 AS DECIMAL(38,0)) * x2)",
    "s22": "SUM(CAST(x2 AS DECIMAL(38,0)) * x2)",
    "sy": "SUM(CAST(y AS DECIMAL(38,0)))",
    "s1y": "SUM(CAST(x1 AS DECIMAL(38,0)) * y)",
    "s2y": "SUM(CAST(x2 AS DECIMAL(38,0)) * y)",
    "syy": "SUM(CAST(y AS DECIMAL(38,0)) * y)",
}


def _ols_tail_exprs() -> dict[str, str]:
    """The shared fixed-IEEE tail: Cramer's rule for the symmetric
    system [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]·b = [sy,s1y,s2y],
    plus R² from the normal-equation identity
    SSE = syy − b0·sy − b1·s1y − b2·s2y and SST = syy − sy²/n.
    Every moment is CAST to DOUBLE exactly once; the returned strings
    parse identically in Spark SQL and DuckDB."""
    a, b, c, d, e, f_, p, q, r, yy = (
        f"CAST({m} AS DOUBLE)" for m in
        ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy"))
    det = (f"({a} * ({d} * {f_} - {e} * {e})"
           f" - {b} * ({b} * {f_} - {e} * {c})"
           f" + {c} * ({b} * {e} - {d} * {c}))")
    det0 = (f"({p} * ({d} * {f_} - {e} * {e})"
            f" - {b} * ({q} * {f_} - {e} * {r})"
            f" + {c} * ({q} * {e} - {d} * {r}))")
    det1 = (f"({a} * ({q} * {f_} - {e} * {r})"
            f" - {p} * ({b} * {f_} - {e} * {c})"
            f" + {c} * ({b} * {r} - {q} * {c}))")
    det2 = (f"({a} * ({d} * {r} - {e} * {q})"
            f" - {b} * ({b} * {r} - {q} * {c})"
            f" + {p} * ({b} * {e} - {d} * {c}))")
    b0, b1, b2 = (f"({dd} / {det})" for dd in (det0, det1, det2))
    sse = f"({yy} - {b0} * {p} - {b1} * {q} - {b2} * {r})"
    sst = f"({yy} - {p} * {p} / {a})"
    return {
        "b0": b0, "b1": b1, "b2": b2,
        "r2": f"(CAST(1e0 AS DOUBLE) - {sse} / {sst})",
    }


def ols_moments(lineitem: DataFrame) -> DataFrame:
    """The 10-cell exact moment row — EVERY cell is a plain sum/count,
    so the table is exactly ADDITIVE under corpus partition: per-batch
    moment rows fold cell-wise to the one-shot row, which is what lets
    the streamed twin re-fit the model continuously and share the batch
    oracle. ``k`` is the constant fold key. Columns: k, n, s1..syy."""
    staged = lineitem.select(
        F.expr(_Y).alias("y"), F.expr(_X1).alias("x1"),
        F.expr(_X2).alias("x2"))
    return staged.agg(*[
        F.expr(expr).alias(name) for name, expr in _MOMENTS.items()
    ]).select(F.lit(0).alias("k"), "*")


def ols_from_moments(moments: DataFrame) -> DataFrame:
    """The Cramer + R² tail over a (folded or one-shot) moment row.
    Columns: n, b0, b1, b2, r2."""
    tail = _ols_tail_exprs()
    return moments.select(
        F.col("n").cast("long").alias("n"),
        *[F.expr(expr).alias(name) for name, expr in tail.items()])


def ols_price_model(lineitem: DataFrame) -> DataFrame:
    """OLS fit of price-cents on (quantity, discount) over the whole
    corpus: y_c = b0 + b1·q_c2 + b2·disc_e4 — the sanity regression a
    pricing pipeline keeps as a drift tripwire (b1 ≈ unit price, b2 the
    discount covariance artifact, R² the fit health metric).
    Columns: n, b0, b1, b2, r2."""
    return ols_from_moments(ols_moments(lineitem))


def ols_price_model_sql() -> str:
    """DuckDB twin: the same moment aggregate and the IDENTICAL tail
    expression strings (single source, :func:`_ols_tail_exprs`)."""
    tail = _ols_tail_exprs()
    mom = ", ".join(f"{expr} AS {name}"
                    for name, expr in _MOMENTS.items())
    sel = ", ".join(f"{expr} AS {name}" for name, expr in tail.items())
    return f"""
        WITH staged AS (
          SELECT {_Y} AS y, {_X1} AS x1, {_X2} AS x2 FROM lineitem
        ),
        m AS (SELECT {mom} FROM staged)
        SELECT CAST(n AS BIGINT) AS n, {sel} FROM m
    """
