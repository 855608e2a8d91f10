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


def mixture_rebalance(docs: DataFrame, target_ppm: dict[str, int],
                      strata_col: str = "lang", key_col: str = "doc_id",
                      salt: str = "mix1") -> DataFrame:
    """Rebalance the corpus to a TARGET mixture (parts-per-million per
    stratum — the domain/language-weighting step of LLM corpus prep):
    compute per-stratum keep rates that realize the largest corpus
    satisfying the target shares, then apply the deterministic hash
    filter. Strata absent from ``target_ppm`` are dropped.

    All integer arithmetic (BIGINT ``div``), so the derived rates are
    engine-exact and oracle-checkable. Plan shape at 100 TB: one
    per-stratum count (tiny aggregate), a scalar min, one BROADCAST join
    of the |strata|-row rate table back to the scan, one map-side
    filter — the corpus itself is never shuffled.

    Rate math: the largest total N s.t. every stratum can supply its
    share is N = min_s floor(c_s * 1e6 / w_s); stratum s then keeps
    permille_s = floor(w_s * N / (1000 * c_s)) of its rows (realized
    counts track w_s·N/1e6 up to hash granularity).
    Columns: doc_id, strata, source passthrough (see entry).
    """
    rates = mixture_rates(docs, target_ppm, strata_col)
    return apply_mixture_rates(docs, rates, strata_col, key_col, salt)


def mixture_rates(docs: DataFrame, target_ppm: dict[str, int],
                  strata_col: str = "lang") -> DataFrame:
    """The BUILD half of :func:`mixture_rebalance`: derive the
    per-stratum keep-rate table (|strata| rows) from corpus counts —
    the trained sampling ARTIFACT a production pipeline computes once,
    persists, and serves to every batch/micro-batch (rate derivation
    needs GLOBAL counts, so it cannot run inside a stream; fixing the
    rates is also what makes a streamed serve equal the one-shot batch
    answer). Columns: strata_col, permille."""
    w = F.lit(0)  # unlisted strata weight 0 → dropped
    for stratum, ppm in sorted(target_ppm.items()):
        w = F.when(F.col(strata_col) == stratum, F.lit(int(ppm))).otherwise(w)
    cnts = (
        docs.groupBy(strata_col).agg(F.count("*").alias("c"))
        .withColumn("w_ppm", w)
        .filter(F.col("w_ppm") > 0)
    )
    caps = cnts.select(
        F.min(F.expr("c * 1000000 div w_ppm")).alias("n_total")
    )
    return cnts.crossJoin(F.broadcast(caps)).select(
        strata_col,
        F.expr("(w_ppm * n_total) div (c * 1000)").alias("permille"),
    )


def apply_mixture_rates(docs: DataFrame, rates: DataFrame,
                        strata_col: str = "lang", key_col: str = "doc_id",
                        salt: str = "mix1") -> DataFrame:
    """The SERVE half: broadcast the rate artifact back to the scan and
    apply the deterministic hash filter — map-only per row, so it runs
    identically over a batch corpus or inside every micro-batch of an
    ingest stream (per-doc decisions depend only on (hash, rate), never
    on other rows)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), F.col(key_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), strata_col)
        .filter((h % _DENOM) < F.col("permille"))
        .select(*docs.columns)
    )


def train_val_test_split(docs: DataFrame, val_ppm: int = 50000,
                         test_ppm: int = 50000, key_col: str = "doc_id",
                         salt: str = "split1") -> DataFrame:
    """Deterministic train/val/test assignment — the split every training
    run must reproduce exactly: h = md5(salt#key) mod 1e6 buckets a
    document once and forever (``df.randomSplit`` is partitioning-
    dependent, so a retry or a cluster resize silently reshuffles the
    eval set — a leak). Membership is decided by the content hash alone:
    adding or removing OTHER documents never moves a document between
    splits (ppm thresholds on the hash, not rank-based quotas).
    Map-only column algebra at any corpus size; engine-exact, so the
    oracle pins the exact assignment. Columns: doc_id, lang, split."""
    return docs.select(
        "doc_id", "lang",
        split_of(F.col(key_col), val_ppm, test_ppm, salt).alias("split"))


def split_of(key, val_ppm: int = 50000, test_ppm: int = 50000,
             salt: str = "split1"):
    """The split assignment as a pure Column function of the key — the
    property that makes the split JOIN-FREE everywhere downstream: any
    operator holding a doc_id (a dup pair, a retrieval hit, an eval row)
    recomputes the member's split map-side instead of joining the
    assignment table. Same md5-threshold contract as
    :func:`train_val_test_split` (which delegates here)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), key.cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long") % 1000000
    return (
        F.when(h < test_ppm, F.lit("test"))
        .when(h < test_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def corpus_mixture_stats(docs: DataFrame) -> DataFrame:
    """Corpus-governance report: per (source, lang) document and token
    counts plus each cell's INTEGER-EXACT parts-per-million share of the
    corpus — the observability twin of :func:`mixture_rebalance` (you
    rebalance toward a target; this measures where the mixture actually
    is). One small groupBy (|sources|·|langs| cells) + a 1-row broadcast
    of the total; token counting is the split-length expression, so the
    whole report is one scan + one tiny-key shuffle at any corpus size.
    Columns: source, lang, n_docs, n_tokens, doc_ppm."""
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
        .alias("n_tokens"),
    )
    total = cells.agg(F.sum("n_docs").alias("total_docs"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "source", "lang", "n_docs", "n_tokens",
            F.expr("n_docs * 1000000 div total_docs").alias("doc_ppm"),
        )
    )


def weighted_systematic_sample(docs: DataFrame, weight_col: str = "n_chars",
                               n_target: int = 200,
                               bucket: int = 4096) -> DataFrame:
    """Probability-proportional-to-size sampling with NO randomness and
    NO transcendentals: lay every row's integer weight on one global
    tape (doc_id order), then take one pick every
    ``stride = max(1, total_weight div n_target)`` weight units —
    classic systematic/PPS sampling, the deterministic spelling of
    "sample documents proportionally to their token count" a corpus
    mixer runs. A row covering the tape interval (cum-w, cum] is picked
    ``n_picks = cum div stride - (cum-w) div stride`` times (heavier
    rows than the stride carry multiplicity, exactly as PPS requires).

    Everything is BIGINT algebra, so the sample is bit-identical on any
    engine and invariant under partitioning — unlike ``df.sample``
    (whose per-partition RNG ties the draw to the cluster layout).

    The global cumulative weight reuses the two-level prefix-sum
    discipline of operators/pipeline.pack_sequences: per-bucket cumsums
    run fully parallel, bucket totals (tiny) cumsum once and broadcast
    back — identical to the naive single-partition window the oracle
    runs. The only driver fetch is the 1-row total (sanctioned).

    Columns: doc_id, w, cum, n_picks (picked rows only)."""
    from pyspark.sql.window import Window

    d = docs.select(
        "doc_id", F.col(weight_col).cast("long").alias("w"),
        F.floor(F.col("doc_id") / bucket).alias("bkt"))
    total = d.agg(F.sum("w")).collect()[0][0]
    stride = max(1, total // n_target)
    w_local = (Window.partitionBy("bkt").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.withColumn("local_end", F.sum("w").over(w_local))
    totals = d.groupBy("bkt").agg(F.sum("w").alias("bkt_total"))
    w_bkt = (Window.orderBy("bkt")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.select(
        "bkt",
        (F.sum("bkt_total").over(w_bkt) - F.col("bkt_total"))
        .alias("bkt_off"))
    cum = F.col("bkt_off") + F.col("local_end")
    return (
        local.join(F.broadcast(offsets), "bkt")
        .withColumn("cum", cum)
        .withColumn(
            "n_picks",
            F.expr(f"CAST(cum DIV {stride} AS BIGINT)"
                   f" - CAST((cum - w) DIV {stride} AS BIGINT)"))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "w", "cum", "n_picks")
    )


def grouped_split(df: DataFrame, group_col: str, val_ppm: int = 100000,
                  test_ppm: int = 100000, salt: str = "gsplit1") -> DataFrame:
    """Leakage-safe train/val/test assignment at GROUP grain: the hash
    is taken over ``group_col``, so every row of a group lands in the
    same split — the discipline that stops near-duplicate rows of one
    user/source/document-family from straddling the train/eval boundary
    (row-grain splits leak whenever rows within a group correlate).
    Same hash-threshold contract as :func:`train_val_test_split`:
    membership depends on the group key alone, map-only, engine-exact.
    Adds a ``split`` column."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt),
                              F.col(group_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long") % 1000000
    split = (
        F.when(h < test_ppm, F.lit("test"))
        .when(h < test_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def stratum_allocation(df: DataFrame, stratum_col: str,
                       budget: int = 100) -> DataFrame:
    """Exact proportional allocation of a fixed sampling budget across
    strata by the LARGEST-REMAINDER method (Hamilton's method / Hare
    quota — the apportionment algorithm; public): floor the exact
    quota budget·n_i/N per stratum, then hand the leftover seats to
    the largest fractional remainders (ties: larger stratum first,
    then name) — so Σ alloc == budget EXACTLY and no stratum deviates
    from its quota by ≥ 1. The eval-set construction step a "sample
    1 000 docs proportionally by language/source" request actually
    needs — naive rounding over- or under-shoots the budget.
    Columns: stratum, n_rows, alloc.

    Scale shape: ONE partial-agged groupBy collapses the corpus to
    |strata| rows; every window after runs on that tiny table (the
    sanctioned driver-sized window). All integer arithmetic."""
    return allocation_from_counts(stratum_counts(df, stratum_col),
                                  budget)


def stratum_counts(df: DataFrame, stratum_col: str) -> DataFrame:
    """(stratum, n_rows) — ADDITIVE under corpus partition, so the
    allocation runs CONTINUOUSLY by folding this table per micro-batch
    (counts_fold_sink) and apportioning at read."""
    return (df.groupBy(F.col(stratum_col).cast("string").alias("stratum"))
            .agg(F.count("*").cast("long").alias("n_rows")))


def allocation_from_counts(s: DataFrame, budget: int = 100) -> DataFrame:
    """The Hamilton apportionment tail of :func:`stratum_allocation`,
    off a (stratum, n_rows) count table (batch-built or
    stream-folded)."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    wr = Window.orderBy(F.col("rem").desc(), F.col("n_rows").desc(),
                        F.col("stratum").asc())
    return (
        s.withColumn("total", F.sum("n_rows").over(w))
        .withColumn("fl", F.expr(f"CAST(({budget} * n_rows) DIV total"
                                 " AS BIGINT)"))
        .withColumn("rem", F.expr(f"({budget} * n_rows) % total"))
        .withColumn("leftover", F.lit(budget) - F.sum("fl").over(w))
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "stratum", "n_rows",
            (F.col("fl") + F.when(F.col("rk") <= F.col("leftover"), 1)
             .otherwise(0)).cast("long").alias("alloc"),
        )
    )


def temperature_mixture(docs: DataFrame, strata_col: str = "lang",
                        ppm_budget: int = 1000000) -> DataFrame:
    """TEMPERATURE-SCALED sampling mixture (the multilingual-corpus
    rebalancing rule of XLM-R / mT5 — Conneau et al. 2020, Xue et al.
    2021; public method): sampling probability q_l ∝ p_l^α flattens the
    raw language distribution so scarce languages are upsampled. α =
    0.5 spelled as sqrt — IEEE-754 sqrt is correctly rounded and hence
    bit-identical on any engine (the pca/_iterate normalize rationale),
    then quantized to a 7 dp scaled integer so every downstream step is
    exact integer arithmetic.

    Both the RAW share and the TEMPERED share are apportioned over the
    same ``ppm_budget`` by Hamilton's largest-remainder method
    (:func:`allocation_from_counts`), so each column sums to the budget
    EXACTLY — the property a downstream token-budget planner needs
    (naive per-row rounding over/under-shoots). Columns: stratum,
    n_docs, raw_ppm, temp_ppm (temp_ppm > raw_ppm for scarce strata).

    Scale shape: one partial-agged groupBy collapses the corpus to
    |strata| rows; both apportionments run on that tiny table. The
    count table is ADDITIVE under corpus partition, so a streamed fold
    of per-micro-batch counts reaches the identical mixture at read
    (:func:`temperature_mixture_from_counts`)."""
    return temperature_mixture_from_counts(
        stratum_counts(docs, strata_col), ppm_budget)


def temperature_mixture_from_counts(counts: DataFrame,
                                    ppm_budget: int = 1000000) -> DataFrame:
    """The apportionment tail of :func:`temperature_mixture`, off a
    (stratum, n_rows) count table — batch-built or stream-folded
    (counts_fold_sink), the stratum_allocation read-at-fold shape."""
    raw = (allocation_from_counts(counts, ppm_budget)
           .select("stratum", F.col("n_rows").alias("n_docs"),
                   F.col("alloc").alias("raw_ppm")))
    tempered = counts.select(
        "stratum",
        F.expr("CAST(ROUND(SQRT(CAST(n_rows AS DOUBLE)) * 10000000)"
               " AS BIGINT)").alias("n_rows"))
    temp = (allocation_from_counts(tempered, ppm_budget)
            .select("stratum", F.col("alloc").alias("temp_ppm")))
    return raw.join(temp, "stratum").select(
        "stratum", "n_docs", "raw_ppm", "temp_ppm")
