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
