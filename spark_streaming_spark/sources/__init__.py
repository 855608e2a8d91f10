"""Sources: batch parquet loaders + streaming readers (typed at ingest)."""

from spark_streaming_spark.sources.batch import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
