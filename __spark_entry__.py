"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``spark_streaming_spark/``; this module only wires
operators to the driver contract. Numeric design note: every float
aggregation is quantized to decimal before summation on BOTH sides so the
value-hash is order- and engine-independent (see
spark_streaming_spark/functions/numeric.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_spark.operators import blacklist as B
from spark_streaming_spark.operators import topk as T
from spark_streaming_spark.operators import wordcount as W
from spark_streaming_spark.sources.batch import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (≡ reference Top3HotProduct): per-brand top-3 parts
    by order-line count, via windowed row_number rank."""
    lineitem = load_table(spark, SMOKE_SF_DIR, "lineitem")
    part = load_table(spark, SMOKE_SF_DIR, "part")
    return T.top3_products_per_brand(lineitem, part)


# --- queries ---------------------------------------------------------------

def _q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.word_count(load_table(spark, sf_dir, "documents"))


def _q_running_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.running_word_count(load_table(spark, sf_dir, "documents"))


def _q_blacklist_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bl = B.make_blacklist(load_table(spark, sf_dir, "customer"))
    return B.blacklist_left_outer(events, bl)


def _q_blacklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bl = B.make_blacklist(load_table(spark, sf_dir, "customer"))
    return B.blacklist_filter(events, bl)


def _q_hot_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.hot_words(load_table(spark, sf_dir, "events"))


def _q_top3_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.top3_products_per_brand(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wordcount": _q_wordcount,
        "running_word_count": _q_running_word_count,
        "blacklist_left_outer": _q_blacklist_left_outer,
        "blacklist_filter": _q_blacklist_filter,
        "hot_words": _q_hot_words,
        "top3_products_per_brand": _q_top3_products,
    }


# --- oracle SQL (DuckDB dialect, same tables as views) ---------------------

_BLACKLIST_CTE = """
blacklist AS (
  SELECT c_custkey AS user_id, (c_custkey % 50 = 0) AS flag
  FROM customer WHERE c_custkey % 10 = 0
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "wordcount": """
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            GROUP BY word
        """,
        "running_word_count": """
            SELECT doc_id, word,
                   count(*) OVER (PARTITION BY word ORDER BY doc_id
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS running_cnt
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
        """,
        "blacklist_left_outer": f"""
            WITH {_BLACKLIST_CTE}
            SELECT e.event_id, e.user_id, e.event_type, b.flag
            FROM events e LEFT OUTER JOIN blacklist b ON e.user_id = b.user_id
        """,
        "blacklist_filter": f"""
            WITH {_BLACKLIST_CTE}
            SELECT event_id, user_id, event_type
            FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM blacklist b
                              WHERE b.user_id = e.user_id AND b.flag)
        """,
        "hot_words": """
            SELECT event_type, count(*) AS cnt
            FROM events GROUP BY event_type
            ORDER BY cnt DESC, event_type LIMIT 3
        """,
        "top3_products_per_brand": """
            WITH clicks AS (
              SELECT p_brand AS brand, p_name AS product,
                     count(*) AS click_count
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY 1, 2
            )
            SELECT brand, product, click_count, rank FROM (
              SELECT brand, product, click_count,
                     CAST(row_number() OVER (
                        PARTITION BY brand
                        ORDER BY click_count DESC, product) AS INTEGER) AS rank
              FROM clicks)
            WHERE rank <= 3
        """,
    }
