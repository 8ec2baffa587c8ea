"""Deterministic sampling and dataset splitting — the reproducibility
primitives a training-data pipeline needs. ``df.sample(seed)`` is
partition-layout dependent (the same seed gives different rows after a
repartition), so everything here derives membership from a CONTENT
hash: stable across runs, cluster sizes, partitionings, and engines —
which is also what makes it DuckDB-oracle-checkable.

Scale notes (100 TB): hash-bucket membership is a map-side predicate —
sampling never shuffles and composes with pushdown (the filter sits on
the scan). Stratified sampling adds one window per stratum ordered by
hash — a single shuffle on the stratum key; quotas are exact, unlike
fraction-based `sampleBy`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long32
from ..registry import register
from ..sources.tables import table

SPLIT_BUCKETS = 100
TRAIN_PCT, VAL_PCT = 80, 10  # test = remainder
STRATUM_QUOTA = 20

SPLIT_SALT = "doc"
_BUCKET_SQL = (
    f"('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))"
    f"::BIGINT % {SPLIT_BUCKETS}"
)


def split_col(id_col, salt: str = SPLIT_SALT):
    """train/val/test assignment from a salted content hash: stable
    under any execution layout; re-salting produces a fresh split."""
    bucket = md5_long32(F.concat(F.lit(salt), id_col.cast("string"))) % SPLIT_BUCKETS
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


@register(
    "dataset_split",
    oracle=f"""
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN {_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
                  WHEN {_BUCKET_SQL} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
    doc=f"Reproducible {TRAIN_PCT}/{VAL_PCT}/{100 - TRAIN_PCT - VAL_PCT} "
    "train/val/test split by salted content hash: the same document "
    "lands in the same split on any cluster, partitioning, or engine "
    "(unlike seed-based sample()). Assignment is a map-side predicate "
    "— zero shuffles before the summary agg.",
    tags=["sampling"],
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "n_chars", split_col(F.col("doc_id")).alias("split")
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


WSYS_K = 50  # target sample size (exactly K picks at any corpus size)
WSYS_SALT = "wsys"
WSYS_G_BITS = 12  # 4096 hash-range groups for the two-level cumsum


@register(
    "sample_weighted",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             ('0x' || substr(md5('{WSYS_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n_chars) OVER () AS total
      FROM t
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM c
    WHERE (cum * {WSYS_K}) // total > ((cum - n_chars) * {WSYS_K}) // total
    """,
    doc=f"Weighted (probability-proportional-to-size) systematic sample "
    f"of {WSYS_K} documents, weight = n_chars: rows are laid on a "
    "cumulative-weight axis in salted-hash order and one doc is picked "
    f"per 1/{WSYS_K} of total weight — inclusion probability "
    "proportional to length; sample size is exactly K provided no "
    "single row outweighs total/K (a heavier row absorbs several "
    "stratum boundaries but is emitted once, standard PPS-systematic "
    "behavior — the invariant picks<=K always holds; see "
    "test_properties.py). All integer "
    "arithmetic (cum*K div total), so the pick set is bit-reproducible "
    "on any engine/cluster/partitioning — unlike exp/log-based weighted "
    "reservoirs (A-ES), whose transcendental keys are libm-dependent. "
    "The cumulative sum is two-level: per-hash-range local windows plus "
    f"a bounded {1 << WSYS_G_BITS}-row offset window — never a global "
    "single-partition sort.",
    tags=["sampling"],
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = md5_long32(F.concat(F.lit(WSYS_SALT), F.col("doc_id").cast("string")))
    t = docs.select(
        "doc_id", "source", "n_chars", h.alias("h"),
        F.shiftright(h, 32 - WSYS_G_BITS).alias("g"),
    )
    w_local = (
        Window.partitionBy("g")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("local_cum", F.sum("n_chars").over(w_local))
    g_tot = t.groupBy("g").agg(F.sum("n_chars").alias("g_chars"))
    w_g = Window.orderBy("g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g_off = g_tot.select(
        "g", (F.sum("g_chars").over(w_g) - F.col("g_chars")).alias("g_offset")
    )
    total = t.agg(F.sum("n_chars").alias("total"))
    return (
        local.join(F.broadcast(g_off), "g")
        .crossJoin(F.broadcast(total))
        .where(
            F.expr(f"(g_offset + local_cum) * {WSYS_K} div total")
            > F.expr(f"((g_offset + local_cum) - n_chars) * {WSYS_K} div total")
        )
        .select("doc_id", "source", "n_chars")
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id) AS rn
      FROM documents
    )
    WHERE rn <= {STRATUM_QUOTA}
    GROUP BY lang
    """,
    doc=f"Stratified sampling with exact quotas: {STRATUM_QUOTA} docs "
    "per language, chosen by hash order (deterministic 'random' "
    "without a seedable RNG shared across engines). One window per "
    "stratum — a single shuffle on the stratum key; quotas are exact "
    "where fraction-based sampleBy is only expected-value.",
    tags=["sampling"],
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = md5_long32(F.concat(F.lit("strat"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        docs.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATUM_QUOTA)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


GROUP_SALT = "grp"
_GROUP_BUCKET_SQL = (
    f"('0x' || substr(md5('{GROUP_SALT}' || source), 1, 8))"
    f"::BIGINT % {SPLIT_BUCKETS}"
)


@register(
    "dataset_split_grouped",
    oracle=f"""
    SELECT split,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT source, n_chars,
             CASE WHEN {_GROUP_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
                  WHEN {_GROUP_BUCKET_SQL} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
    doc="Group-aware (leakage-safe) train/val/test split: the hash is "
    "taken over the GROUP key (source — the provenance unit at which "
    "mirrors, boilerplate and near-duplicates correlate), so every "
    "document of a source lands in the same split by construction — "
    "correlated documents can never straddle train and test, the "
    "failure mode a per-document hash split (dataset_split) cannot "
    "rule out. Same salted-md5 assignment, still a map-side "
    "predicate; group-level balance is quantified by the audit "
    "output (per-split source and doc counts). For near-dup-level "
    "grouping, feed dedup_clusters reps as the group key — same "
    "shape.",
    tags=["sampling", "training_prep"],
)
def dataset_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "n_chars",
            split_col(F.col("source"), salt=GROUP_SALT).alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


FAMILY_SALT = "fam"


def _cluster_split_oracle() -> str:
    from .dedup import _CLUSTERS_LSH_ORACLE

    fam_bucket = (
        f"('0x' || substr(md5('{FAMILY_SALT}' || CAST(family AS VARCHAR)), 1, 8))"
        f"::BIGINT % {SPLIT_BUCKETS}"
    )
    return f"""
    SELECT doc_id, family,
           CASE WHEN {fam_bucket} < {TRAIN_PCT} THEN 'train'
                WHEN {fam_bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS family
      FROM documents d
      LEFT JOIN ({_CLUSTERS_LSH_ORACLE}) c ON c.doc_id = d.doc_id
    )
    """


@register(
    "dataset_split_cluster",
    oracle=_cluster_split_oracle(),
    doc="Duplicate-CLUSTER-aware train/val/test split — the concrete "
    "near-dup instance dataset_split_grouped's docstring promises: the "
    "split hash is taken over each document's dedup FAMILY key (its "
    "dedup_clusters_lsh cluster rep; singletons key on themselves), so "
    "every exact or near duplicate of a document lands in the SAME "
    "split by construction — zero cross-split near-dup leakage, the "
    "property split_leakage_audit can only measure after the fact and "
    "split_decontaminate can only repair. Output is the full "
    "(doc_id, family, split) assignment. At 100 TB the family key "
    "comes from the standing cluster assignment (maintained "
    "incrementally by dedup_clusters_delta), so the split itself is "
    "one hash-predicate map pass + one hash join on doc_id — and "
    "because the assignment is content-keyed, re-crawled duplicates "
    "can never drift into eval. Zero-leak + naive-split-leaks "
    "contrast pinned in tests/test_components.py.",
    tags=["sampling", "training_prep", "dedup"],
)
def dataset_split_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import cluster_assignment

    docs = table(spark, sf_dir, "documents")
    # one hash join against the standing label table — the docstring's
    # 100 TB shape; the artifact is built once per (app, dataset)
    clusters = cluster_assignment(spark, sf_dir)
    fam = F.coalesce("cluster_rep", "doc_id").alias("family")
    return (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            fam,
            split_col(
                F.coalesce("cluster_rep", "doc_id"), salt=FAMILY_SALT
            ).alias("split"),
        )
    )
