"""Python UDTF surface (SURVEY.md §2.11): a real table-generating
function, not the applyInPandas stand-in.

The reference's only table-generating operator is ``flatMap`` (one line →
many words, ``WordCount.java:32-35``); Spark's modern spelling for
"one row in, a VARIABLE, computed number of rows out, with per-row
sequential logic" is the Python UDTF (``pyspark.sql.functions.udtf``,
Spark 3.5+/4.x) consumed via a SQL LATERAL join.

``TokenRuns`` emits the maximal runs of consecutively repeated tokens in
each document — a per-row stateful scan (run detection needs the
previous token, so it is not a pure column expression) that genuinely
wants the UDTF shape. It has an exact relational twin (gaps-and-islands
over a window), so the entry is DuckDB-oracle-checked like every other
operator.

Scale notes: a UDTF executes Python per input row — the slow path by
doctrine. It is the right tool when per-row sequential logic emits
variable rows AND the row count is modest post-filter; for corpus-scale
repetition signals use the shuffle-free column-expression spelling in
``operators/pipeline.repetition_signals``. Arrow batching
(``spark.sql.execution.pythonUDTF.arrow.enabled``) amortizes the
serialization; the LATERAL join itself stays a map-side Generate — no
shuffle is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


@udtf(returnType="token string, run_start int, run_len int")
class TokenRuns:
    """Maximal runs of the same token repeated ≥2 times consecutively.
    ``run_start`` is the 1-based token position of the run's first
    element (1-based to match the SQL twin's row_number arithmetic)."""

    def eval(self, text: str):
        toks = text.split(" ") if text else []
        i = 0
        while i < len(toks):
            j = i
            while j + 1 < len(toks) and toks[j + 1] == toks[i]:
                j += 1
            if j > i:
                yield (toks[i], i + 1, j - i + 1)
            i = j + 1


def token_runs(docs: DataFrame) -> DataFrame:
    """Per-document repeated-token runs via the UDTF + LATERAL join.
    Columns: doc_id, token, run_start, run_len (runs of length ≥ 2)."""
    spark = docs.sparkSession
    spark.udtf.register("token_runs", TokenRuns)
    docs.select("doc_id", "text").createOrReplaceTempView("_token_runs_in")
    return spark.sql(
        "SELECT d.doc_id, s.token, s.run_start, s.run_len "
        "FROM _token_runs_in d, LATERAL token_runs(d.text) s"
    )
