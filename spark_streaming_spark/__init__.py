"""spark_streaming_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming) engine with the query and data-processing capabilities of the
reference repo ``sotowang/Spark_Streaming`` (see ``SURVEY.md``), extended
with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design rules (enforced throughout):

* Every operator is a pure ``DataFrame -> DataFrame`` function, so the
  same code runs in batch (checked against a DuckDB oracle) and under
  Structured Streaming (``foreachBatch`` / ``availableNow`` replay).
* DataFrame/SQL only — no RDDs. Catalyst does pushdown/pruning/broadcast.
* Floating aggregations that must match an external oracle are quantized
  to decimals first (order-independent exact sums → engine-identical).
"""

from spark_streaming_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
