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


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    """The point of Z-ordering: after clustering on the Morton key of
    (x, y), EVERY file's min/max range on BOTH columns is narrow — so
    parquet data skipping prunes files for predicates on either column.
    A plain sort by x leaves y spanning its whole domain in every file;
    the z-layout's summed y-extent must be materially smaller."""
    import pyarrow.parquet as pq

    from spark_streaming_spark.operators.maintenance import zorder_layout

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(df, "x", "y", n_files=16, bits=6).write.parquet(zdir)
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions(
        "x").write.parquet(sdir)

    def y_extent(path):
        import os
        total = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                col = {md.row_group(rg).column(i).path_in_schema: i
                       for i in range(md.row_group(rg).num_columns)}
                st = md.row_group(rg).column(col["y"]).statistics
                total += st.max - st.min
        return total

    z_ext, s_ext = y_extent(zdir), y_extent(sdir)
    # uniform grid: x-sorted files each span ~the full y domain; the
    # z-curve bounds each file to a few quadrants
    assert z_ext * 2 < s_ext, (z_ext, s_ext)
