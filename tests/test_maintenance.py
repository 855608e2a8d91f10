"""Layout maintenance (operators/maintenance.py): partitioned write,
small-file compaction, content preservation, partition pruning."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from spark_streaming_spark.operators import maintenance as MT
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_compaction_reduces_files_preserves_rows(spark):
    events = load_table(spark, SF_DIR, "events")
    path = tempfile.mkdtemp(prefix="mt_")
    try:
        # fragment: 16 shuffled files per day partition
        MT.write_day_partitioned(events.repartition(16), path)
        before = {r.day: r.n_files
                  for r in MT.layout_stats(spark, path).collect()}
        assert max(before.values()) > 4, before
        baseline = {tuple(r) for r in spark.read.parquet(path)
                    .drop("day").collect()}

        MT.compact_partitions(spark, path)
        after = {r.day: r.n_files
                 for r in MT.layout_stats(spark, path).collect()}
        assert set(after) == set(before)
        assert all(n <= 2 for n in after.values()), after
        assert sum(after.values()) < sum(before.values())
        # content identical
        compacted = {tuple(r) for r in spark.read.parquet(path)
                     .drop("day").collect()}
        assert compacted == baseline

        # partition pruning: a one-day filter reads one partition dir
        one_day = sorted(after)[0]
        pruned = spark.read.parquet(path).filter(F.col("day") == one_day)
        import io, contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            pruned.explain("formatted")
        txt = buf.getvalue()
        assert "PartitionFilters" in txt and "day" in txt
    finally:
        shutil.rmtree(path, ignore_errors=True)
