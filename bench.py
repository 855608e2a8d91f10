"""Benchmark harness: run every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed with the `noop` sink — full computation, no
driver-side collect — which is what a cluster deployment would measure.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import __spark_entry__ as entrymod
from spark_streaming_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with the flagship query once
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # record failures without killing the run
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
