"""Physical-plan introspection: the engine's scale posture, made testable."""

from spark_streaming_spark.plans.explain import (
    explain_text,
    has_broadcast_join,
    has_cartesian_product,
    has_partial_aggregate,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_text",
    "has_broadcast_join",
    "has_cartesian_product",
    "has_partial_aggregate",
    "has_take_ordered",
    "pushed_filters",
    "read_schema_columns",
]
