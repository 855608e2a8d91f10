"""Word count — the reference's core pipeline, as one declarative query.

Reference: socket line -> flatMap(split) -> (word,1) -> reduceByKey -> print
(``/root/reference/src/main/java/com/soto/WordCount.java:32-53``; same shape
in HDFSWordCount/KafkaReceiverWordCount/KafkaDirectWordCount).

Ours: scan -> project -> explode -> hash aggregate. Catalyst plans the
``reduceByKey`` equivalent as partial (map-side) + final aggregation, and
only ``text`` is read from parquet (column pruning). At 100 TB the explode
inflates rows ~word-count-per-doc ×, but partial aggregation collapses them
before the single shuffle on ``word`` — the same shuffle the reference paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-word counts over a text column. Columns: word, cnt."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def running_word_count(docs: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id") -> DataFrame:
    """Batch analog of ``updateStateByKey`` running totals
    (``UpdateStateByKeyWordCount.java:54-78``): cumulative per-word count
    in ``key_col`` order — i.e. the state the stream would hold after each
    document arrived. Streaming twin: streaming/pipelines.py
    ``running_count_stream`` (state store, outputMode=update)."""
    from pyspark.sql.window import Window

    exploded = docs.select(
        F.col(key_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    # RANGE (peer-inclusive) frame: every occurrence within the same key
    # gets the same running count, so row values are deterministic even
    # when a word repeats inside one document.
    w = (
        Window.partitionBy("word")
        .orderBy(key_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return exploded.select(
        F.col(key_col),
        F.col("word"),
        F.count("*").over(w).alias("running_cnt"),
    )
