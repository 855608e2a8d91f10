"""PII redaction (operators/redaction.py): scrub correctness on crafted
inputs, idempotence (scrubbed text contains no residual matches), and
non-vacuous augmentation classes on the driver corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_spark.operators import redaction as RED
from spark_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _crafted(spark):
    return spark.createDataFrame(
        [
            (1, "mail a.b+c-d_e@foo-bar.example.com or x99@y.io today"),
            (2, "call 555-123-4567 and 555-0100-4242 now"),
            (3, "from 10.0.0.1 then 192.168.255.3"),
            (4, "no pii here at all"),
            (5, "mix: a@b.co 555-111-2222 1.2.3.4"),
        ],
        "doc_id long, text string",
    )


def test_scrub_counts_and_redaction(spark):
    out = {r["doc_id"]: r for r in RED.pii_scrub(_crafted(spark)).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 2, 0)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 2)
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ips"]) == (0, 0, 0)
    assert (out[5]["n_emails"], out[5]["n_phones"], out[5]["n_ips"]) == (1, 1, 1)


def test_scrub_leaves_no_residual_matches(spark):
    clean = RED._scrubbed(F.col("text"))
    residual = (
        _crafted(spark)
        .select(
            F.regexp_count(clean, F.lit(RED.EMAIL_RE)).alias("e"),
            F.regexp_count(clean, F.lit(RED.PHONE_RE)).alias("p"),
            F.regexp_count(clean, F.lit(RED.IPV4_RE)).alias("i"),
        )
        .agg(F.sum("e").alias("e"), F.sum("p").alias("p"), F.sum("i").alias("i"))
        .first()
    )
    assert (residual.e, residual.p, residual.i) == (0, 0, 0)


def test_augmentation_classes_nonempty(spark):
    """The entry's augmented corpus must exercise every redaction class —
    otherwise the driver's oracle check is vacuous."""
    docs = load_table(spark, SF_DIR, "documents")
    agg = (
        RED.pii_scrub(RED.augment_with_pii(docs))
        .agg(
            F.sum((F.col("n_emails") > 0).cast("int")).alias("e"),
            F.sum((F.col("n_phones") > 0).cast("int")).alias("p"),
            F.sum((F.col("n_ips") > 0).cast("int")).alias("i"),
            F.sum(
                ((F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) == 0)
                .cast("int")
            ).alias("untouched"),
        )
        .first()
    )
    assert agg.e > 0 and agg.p > 0 and agg.i > 0 and agg.untouched > 0


def test_scrub_is_map_only(spark):
    """Plan shape: a single scan, no shuffle (Exchange) anywhere — at
    100 TB this operator must stay embarrassingly parallel."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        RED.pii_scrub(RED.augment_with_pii(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_l_diversity_catches_homogeneous_group(spark):
    """The homogeneity attack k-anonymity misses: a group of 5 records
    (k-anonymous at k=5) whose sensitive value is uniform must flag
    under l-diversity, while a same-size diverse group must not."""
    from pyspark.sql import functions as F

    from spark_streaming_spark.operators import redaction as RED

    rows = ([("g1", i, 100.0) for i in range(5)]          # uniform
            + [("g2", 10 + i, 100.0 * i) for i in range(5)])  # diverse
    df = spark.createDataFrame(rows, "grp string, id long, bal double")
    out = RED.l_diversity_violations(
        df, ["grp"], F.expr("CAST(FLOOR(bal / 100) AS BIGINT)"), l=3)
    got = {r["grp"]: r for r in out.collect()}
    assert "g1" in got and got["g1"]["n_sensitive"] == 1
    assert "g2" not in got
