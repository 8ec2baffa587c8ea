"""Privacy operators: re-identification risk measurement and
pseudonymization audit — what a user-event corpus must pass before it
can feed a training pipeline.

Scale notes (100 TB): both queries are single groupBy aggregations
(classes are quasi-identifier tuples / pseudonyms — bounded domains far
smaller than the row count); the k-anonymity summary folds the class
histogram into one row with conditional aggregates, and the pseudonym
audit's distinct counts swap for HLL sketches at extreme cardinality
(the contract pattern in ``operators/sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_long32
from ..registry import register
from ..sources.tables import table

K_ANON = 5  # minimum acceptable equivalence-class size
VALUE_BUCKET = 100.0  # quasi-identifier coarsening of `value`
PSEUDO_SALT = "release-2026-08"


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT event_type,
             extract(hour FROM ts) AS hod,
             CAST(floor(value / {VALUE_BUCKET}) AS BIGINT) AS vb,
             count(*) AS c
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k_threshold,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN c < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(sum(CASE WHEN c < {K_ANON} THEN c ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(min(c) AS BIGINT) AS min_class,
           CAST(max(c) AS BIGINT) AS max_class
    FROM classes
    """,
    doc=f"k-anonymity audit over the event table: equivalence classes "
    "on the quasi-identifier tuple (event_type, hour-of-day, value "
    f"bucket); rows in classes smaller than k={K_ANON} are "
    "re-identification risks that need suppression or further "
    "coarsening before release. One groupBy over bounded class "
    "cardinality + a one-row conditional rollup.",
    tags=["privacy", "quality"],
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    classes = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.hour("ts").alias("hod"),
            F.floor(F.col("value") / VALUE_BUCKET).alias("vb"),
        )
        .agg(F.count("*").alias("c"))
    )
    small = F.col("c") < K_ANON
    return classes.agg(
        F.lit(K_ANON).cast("long").alias("k_threshold"),
        F.count("*").alias("n_classes"),
        F.sum(small.cast("long")).alias("n_small_classes"),
        F.sum(F.when(small, F.col("c")).otherwise(0)).alias("n_rows_at_risk"),
        F.min("c").alias("min_class"),
        F.max("c").alias("max_class"),
    )


@register(
    "privacy_pseudonymize",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             md5('{PSEUDO_SALT}' || CAST(user_id AS VARCHAR)) AS pseudonym
      FROM events
    )
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
           CAST(count(DISTINCT user_id) - count(DISTINCT pseudonym) AS BIGINT)
             AS n_collisions,
           min(pseudonym) AS first_pseudonym
    FROM p
    """,
    doc="Pseudonymization audit: user ids replaced by salted digests "
    "(rotate the salt per release to break cross-release joinability); "
    "the audit proves the mapping is collision-free (1:1) on this "
    "corpus. Map-side digest, one distinct aggregate.",
    tags=["privacy"],
)
def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "events").select(
        "user_id",
        F.md5(F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string"))).alias(
            "pseudonym"
        ),
    )
    return p.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("pseudonym").alias("n_pseudonyms"),
        (F.count_distinct("user_id") - F.count_distinct("pseudonym")).alias(
            "n_collisions"
        ),
        F.min("pseudonym").alias("first_pseudonym"),
    )


# --- PII masking (the Dolma / C4-style release scrub) ---

# Conservative leftmost-greedy patterns with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): no lookarounds, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE_RE = r"\+?\d[\d -]{7,}\d"
PII_MASKS = ("|||EMAIL|||", "|||IP|||", "|||PHONE|||")


@register(
    "pii_scrub",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_email,
             regexp_replace(text, '{PII_EMAIL_RE}', '{PII_MASKS[0]}', 'g')
               AS t1
      FROM documents
    ),
    c2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1, '{PII_IPV4_RE}')) AS n_ip,
             regexp_replace(t1, '{PII_IPV4_RE}', '{PII_MASKS[1]}', 'g')
               AS t2
      FROM c
    ),
    c3 AS (
      SELECT doc_id, n_email, n_ip,
             len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS n_phone,
             regexp_replace(t2, '{PII_PHONE_RE}', '{PII_MASKS[2]}', 'g')
               AS t3
      FROM c2
    )
    SELECT doc_id,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_ip AS BIGINT) AS n_ip,
           CAST(n_phone AS BIGINT) AS n_phone,
           n_email + n_ip + n_phone > 0 AS had_pii,
           md5(t3) AS scrubbed_md5
    FROM c3
    """,
    doc="PII masking for release (the Dolma recipe): emails, IPv4 "
    "addresses, and phone-number shapes are replaced with fixed mask "
    "tokens in a FIXED pass order (email -> ip -> phone, each pass "
    "re-scanning the prior pass's output, so the two engines see the "
    "identical intermediate strings), with per-type match counts and "
    "the scrubbed text's digest as the verifiable artifact — the hash "
    "match proves the byte-identical scrub, not just the counts. "
    "Patterns are lookaround-free so Java regex and RE2 agree on "
    "every match boundary. Shuffle-free map work over the corpus "
    "scan; masking composes with the span-scrub ledger the "
    "ExactSubstr family maintains.",
    tags=["privacy", "llm-pipeline"],
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub_frame(table(spark, sf_dir, "documents"))


def pii_scrub_frame(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """The scrub as a pure column transformation — shared verbatim by
    the batch query and the streaming ingest twin (stateless map work,
    append-mode safe on an unbounded stream). ``keep`` threads extra
    input columns through unchanged (single-pass stream composition,
    streaming/ingest_release.py:ingest_release_stream); kept names
    must not collide with the scrub's computed columns."""
    reserved = {
        "doc_id", "n_email", "t1", "n_ip", "t2", "n_phone", "t3",
        "had_pii", "scrubbed_md5",
    }
    clash = reserved.intersection(keep)
    if clash:
        raise ValueError(
            "pii_scrub_frame keep= collides with computed columns: "
            f"{sorted(clash)}"
        )
    t1 = F.regexp_replace("text", PII_EMAIL_RE, PII_MASKS[0])
    c = docs.select(
        "doc_id",
        *keep,
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_email"),
        t1.alias("t1"),
    )
    c2 = c.select(
        "doc_id",
        *keep,
        "n_email",
        F.size(F.regexp_extract_all("t1", F.lit(PII_IPV4_RE), 0))
        .cast("long")
        .alias("n_ip"),
        F.regexp_replace("t1", PII_IPV4_RE, PII_MASKS[1]).alias("t2"),
    )
    c3 = c2.select(
        "doc_id",
        *keep,
        "n_email",
        "n_ip",
        F.size(F.regexp_extract_all("t2", F.lit(PII_PHONE_RE), 0))
        .cast("long")
        .alias("n_phone"),
        F.regexp_replace("t2", PII_PHONE_RE, PII_MASKS[2]).alias("t3"),
    )
    return c3.select(
        "doc_id",
        *keep,
        "n_email",
        "n_ip",
        "n_phone",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone") > 0).alias(
            "had_pii"
        ),
        F.md5("t3").alias("scrubbed_md5"),
    )
