"""Top-k operators: global sorted-limit and partitioned row_number rank.

Reference shapes:

* Global top-3 hot words: swap → ``sortByKey(false)`` → swap → ``take(3)``
  (``WindowHotWord.java:64-87``) — 4 operators + a driver-side action.
  Ours is ``orderBy(...desc).limit(k)`` which Catalyst plans as
  ``TakeOrderedAndProject``: each partition keeps a k-row heap, the driver
  merges heaps — no global sort, no full shuffle. At 100 TB this is the
  difference between a terabyte shuffle and kilobytes to the driver.

* Per-category top-3 products: SQL ``row_number() over (partition by
  category order by click_count desc) rank ... where rank <= 3``
  (``Top3HotProduct.java:92-103``). Ours is the same analytic, one
  shuffle on the partition key.

Every ordering carries a deterministic tie-break on the key column so the
DuckDB oracle hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_global(df: DataFrame, order_col: str, k: int,
                 tiebreak: str) -> DataFrame:
    """ORDER BY order_col DESC, tiebreak ASC LIMIT k."""
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak).asc()).limit(k)


def hot_words(events: DataFrame, k: int = 3) -> DataFrame:
    """Global hot-'word' top-k over the events table (event_type plays the
    search-word role per FIXTURES.md F3). Columns: event_type, cnt."""
    counts = events.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return top_k_global(counts, "cnt", k, "event_type")


def top_n_per_group(df: DataFrame, partition_col: str, order_col: str,
                    tiebreak: str, n: int) -> DataFrame:
    """row_number() over (partition by p order by o desc, t asc) <= n.
    Adds a ``rank`` column (int)."""
    w = Window.partitionBy(partition_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def top3_products_per_brand(lineitem: DataFrame, part: DataFrame,
                            n: int = 3) -> DataFrame:
    """Flagship query (≡ Top3HotProduct): per brand ('category'), the top-3
    parts ('products') by order-line count.

    Scale notes: the lineitem→part join carries NO mandatory broadcast
    hint — part scales with SF (~1/30 of lineitem), so AQE makes the
    size-conditional choice: auto-broadcast below threshold, shuffle on
    p_partkey at 100 TB. The rank window then shuffles once on brand.
    Columns: brand, product, click_count, rank.
    """
    clicks = (
        lineitem.select("l_partkey")
        .join(part.select("p_partkey", "p_brand", "p_name"),
              lineitem["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_name").alias("product"))
        .agg(F.count("*").alias("click_count"))
    )
    return top_n_per_group(clicks, "brand", "click_count", "product", n)


def top3_products_sql(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """The reference's literal SQL surface: the same ranking expressed as
    a SQL string over a registered temp view — mirroring
    ``Top3HotProduct.java:92-103`` ("select ... row_number() over
    (partition by category order by click_count desc) rank ... where
    rank<=3" on view ``product_click_log``), parsed by Catalyst instead
    of HiveContext (no Hive needed in Spark ≥ 2, SURVEY.md §2.5).
    Plans identically to the DataFrame twin — SQL vs DataFrame is
    surface syntax, not a different engine path.
    Columns: brand, product, click_count."""
    clicks = (
        lineitem.select("l_partkey")
        .join(part.select("p_partkey", "p_brand", "p_name"),
              lineitem["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_name").alias("product"))
        .agg(F.count("*").alias("click_count"))
    )
    # unique view name + drop after plan resolution: spark.sql() resolves
    # the view eagerly at analysis, so the returned DataFrame stays valid
    # and the session catalog is left untouched (no clobbering a user's
    # own view of the same name)
    import uuid

    view = f"product_click_log_{uuid.uuid4().hex[:8]}"
    clicks.createOrReplaceTempView(view)
    spark = clicks.sparkSession
    try:
        return spark.sql(f"""
            SELECT brand, product, click_count FROM (
              SELECT brand, product, click_count,
                     row_number() OVER (PARTITION BY brand
                                        ORDER BY click_count DESC, product) AS rank
              FROM {view}
            ) WHERE rank <= 3
        """)
    finally:
        spark.catalog.dropTempView(view)
