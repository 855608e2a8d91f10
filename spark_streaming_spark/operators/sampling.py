"""Deterministic sampling for training-data pipelines.

``df.sample(fraction, seed)`` is engine- and partitioning-dependent (the
Bernoulli draw happens per partition with a per-split RNG), so two runs
on different cluster layouts select different rows — unacceptable for a
reproducible corpus. These operators sample by CONTENT HASH instead:

    keep(row)  ⇔  md5(stable_key) mod D  <  k

Pure column algebra (whole-stage codegen, no Python, no shuffle for the
flat sample), identical on any engine with md5 — so the sample is stable
under repartitioning, retries, scale-up, and is oracle-checkable. This
is how production corpus pipelines pin "the 10% sample" across reruns.

The hash uses the first 15 hex chars of md5 (60 bits, fits a BIGINT
exactly) — same parity trick as operators/dedup.simhash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DENOM = 1000


def deterministic_sample(docs: DataFrame, permille: int = 100,
                         key_col: str = "doc_id",
                         salt: str = "s1") -> DataFrame:
    """Keep ~permille/1000 of rows, chosen by content hash of ``key_col``.
    Changing ``salt`` draws an independent sample; the same (salt,
    permille) always selects the same rows. Columns: passthrough."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), F.col(key_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return docs.filter((h % _DENOM) < permille)


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      permille: dict[str, int] | None = None,
                      default_permille: int = 100,
                      key_col: str = "doc_id",
                      salt: str = "s1") -> DataFrame:
    """Per-stratum hash sampling: each stratum gets its own keep rate
    (e.g. upsample scarce languages, downsample dominant ones) while
    staying fully deterministic. The rate lookup is a CASE expression —
    no join, no shuffle; rebalancing a 100 TB corpus is a single map.
    Columns: passthrough."""
    permille = permille or {}
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), F.col(key_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    rate = F.lit(default_permille)
    for stratum, p in sorted(permille.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(rate)
    return docs.filter((h % _DENOM) < rate)
