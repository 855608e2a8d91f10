"""PII redaction for training corpora: regex scrubbing of emails, phone
numbers, and IPv4 addresses (north-star extension; no reference twin —
the reference's only text transform is whitespace split,
``/root/reference/src/main/java/com/soto/WordCount.java:32-37``).

Every production LLM corpus runs a PII scrub before training (public
method — e.g. the C4 / Dolma / FineWeb cleaning pipelines all document
regex-based email/phone/IP removal). The operator is map-only column
algebra: three ``regexp_replace`` passes plus ``regexp_count`` signals —
whole-stage codegen, zero shuffles, full column pruning. At 100 TB this
is a single parquet scan.

Regex dialect note: Spark compiles Java ``java.util.regex``; DuckDB
compiles RE2. The patterns below deliberately use only the shared subset
(character classes, bounded repetition, grouping — no backrefs, no
lookaround) so the DuckDB oracle is bit-identical.

The driver's synthetic ``documents.text`` is word-salad with no PII, so
a scrub over the raw column would be vacuous (every count 0). The
*entry* therefore augments the text with deterministic doc_id-derived
contact strings — the same augmentation expressed in the oracle SQL —
making the keep/redact classes non-empty while the operator itself stays
a pure text→text scrub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java-regex/RE2 subset (no lookaround, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def augment_with_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic test augmentation: append doc_id-derived contact
    strings to a subset of documents (doc_id % 3 → email, % 5 → phone,
    % 7 → IPv4). Pure column algebra with an identical SQL spelling in
    the oracle — NOT part of the production scrub, which operates on
    whatever the text column already contains."""
    did = F.col("doc_id")
    t = F.col(text_col)
    t = F.when(
        did % 3 == 0,
        F.concat(t, F.lit(" contact user"), did.cast("string"),
                 F.lit("@example.com")),
    ).otherwise(t)
    t = F.when(
        did % 5 == 0,
        F.concat(t, F.lit(" call 555-01"),
                 F.lpad((did % 100).cast("string"), 2, "0"),
                 F.lit("-4242")),
    ).otherwise(t)
    t = F.when(
        did % 7 == 0,
        F.concat(t, F.lit(" from 10.0."), (did % 256).cast("string"),
                 F.lit("."), ((did * 7) % 256).cast("string")),
    ).otherwise(t)
    return docs.withColumn(text_col, t)


def _scrubbed(t: Column) -> Column:
    """Three-pass replace, fixed order (emails → phones → IPs) so both
    engines transform identically."""
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PHONE_RE, "<PHONE>")
    return F.regexp_replace(t, IPV4_RE, "<IP>")


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document redaction signals plus a fingerprint of the redacted
    text. Columns: doc_id, n_emails, n_phones, n_ips, clean_len,
    clean_fp (md5 of the scrubbed text — lets the oracle verify the
    REPLACEMENT byte-for-byte without shipping full text through the
    compare).

    Count semantics: n_emails/n_phones/n_ips are RAW-TEXT match counts —
    each pattern counted independently against the original text, not
    replacement counts against the progressively scrubbed text. A
    phone- or IP-shaped substring inside an email local part is counted
    under its own pattern even though the sequential scrub (emails
    first) removes it in the email pass. The oracle mirrors the same
    raw-text counting, so parity holds; consumers wanting exact
    replacement counts should diff match counts on ``clean``.

    Map-only; at 100 TB the scrubbed text would be written back to
    parquet in the same pass (see ``operators/maintenance.py`` for the
    layout side)."""
    t = F.col(text_col)
    clean = _scrubbed(t)
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_fp"),
    )


def k_anonymity_violations(df: DataFrame, quasi_cols: list[str],
                           k: int = 5) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, "k-anonymity: a model for
    protecting privacy"; public method) — the release gate next to the
    PII scrub: quasi-identifier combinations shared by FEWER than ``k``
    records are the groups an adversary could re-identify, and a
    governed release suppresses or generalizes them first. Emits every
    violating combination with its record count (the suppression
    worklist). ONE partial-agged groupBy over the quasi-identifier key
    — a single scan at any scale. Columns: quasi_cols..., n_records."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("n_records"))
        .filter(F.col("n_records") < k)
    )


def l_diversity_violations(df: DataFrame, quasi_cols: list[str],
                           sensitive_col, l: int = 3) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, "l-diversity:
    privacy beyond k-anonymity"; public method) — the gate k-anonymity
    misses: a quasi-identifier group can be large yet still leak if
    every member shares the SAME sensitive value (the homogeneity
    attack). Emits every group whose sensitive attribute takes fewer
    than ``l`` distinct values, with its record count and distinct
    count — the generalization/suppression worklist. ``sensitive_col``
    may be a Column expression (e.g. a banded numeric). ONE
    partial-agged groupBy with a distinct-count — a single scan at any
    scale. Columns: quasi_cols..., n_records, n_sensitive."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("n_records"),
             F.count_distinct(sensitive_col).cast("long")
             .alias("n_sensitive"))
        .filter(F.col("n_sensitive") < l)
    )


def t_closeness_violations(df: DataFrame, quasi_cols: list[str],
                           sensitive_col: str,
                           t_ppm: int = 300000) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007,
    "t-closeness: privacy beyond k-anonymity and l-diversity"; public
    method) — the gate l-diversity misses: a group can be diverse yet
    still leak if its sensitive-value DISTRIBUTION deviates from the
    table's (skewness attack). For a categorical sensitive attribute
    the variational distance is the EMD, computed exactly in integers:

        dist_num(g) = Σ_s |cnt_g(s)·N − cnt(s)·n_g|
        dist_ppm(g) = (1e6 · dist_num) DIV (2 · n_g · N)

    Emits groups with dist_ppm > ``t_ppm`` — the
    generalization/suppression worklist, ranked worst first by the
    caller. Scale shape: one partial-agged (QI, sensitive) groupBy, a
    broadcast global sensitive distribution (≤ |values| rows), the
    group×value grid materialized ONLY for QI groups (|groups|·|values|
    rows — never the corpus). Columns: quasi_cols..., n_records,
    dist_ppm."""
    per = (df.groupBy(*quasi_cols, sensitive_col)
           .agg(F.count("*").cast("long").alias("cnt_gs")))
    glob = (df.groupBy(sensitive_col)
            .agg(F.count("*").cast("long").alias("cnt_s")))
    tot = df.agg(F.count("*").cast("long").alias("n_total"))
    groups = (per.groupBy(*quasi_cols)
              .agg(F.sum("cnt_gs").cast("long").alias("n_g")))
    grid = (groups.crossJoin(F.broadcast(glob))
            .join(per, [*quasi_cols, sensitive_col], "left")
            .select(*quasi_cols, "n_g", "cnt_s",
                    F.coalesce("cnt_gs", F.lit(0)).alias("cnt_gs")))
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy(*quasi_cols)
        .agg(F.first("n_g").alias("n_g"),
             F.sum(F.abs(F.col("cnt_gs") * F.col("n_total")
                         - F.col("cnt_s") * F.col("n_g"))
                   .cast("decimal(38,0)"))
             .alias("dist_num"),
             F.first("n_total").alias("n_total"))
        .select(*quasi_cols,
                F.col("n_g").cast("long").alias("n_records"),
                # decimal-widened scaled divide (the revenue-share ppm
                # idiom) — 1e6·dist_num overflows BIGINT once n_g·N
                # passes ~9e12, well inside 100 TB territory
                F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * dist_num)"
                       " div (CAST(2 AS DECIMAL(38,0)) * n_g * n_total)"
                       " AS BIGINT)").alias("dist_ppm"))
        .filter(F.col("dist_ppm") > t_ppm)
    )
