"""Entity resolution — fuzzy matching over structured records.

The 100 TB problem: product/customer catalogs accrete misspelled and
reformatted duplicates ("small ring" / "smal ring") that exact dedup
(`dedup_exact`) cannot see. All-pairs edit distance is O(n^2); the
production shape is the same candidate-restriction discipline as the
text dedup family (`operators/dedup.py`):

1. **Exact-collapse first**: group identical names, keeping a count
   and a representative key — the pairwise stage then runs over
   DISTINCT names only (64 reps here vs 2000 rows; at catalog scale,
   millions of rows collapse to the name vocabulary).
2. **Blocking**: self-join only within a cheap equality block (the
   head noun of the name). Pair candidates are per-block quadratic in
   DISTINCT names, not rows — the blocking key is the knob that keeps
   the largest block bounded (compose keys / add a length band when a
   block grows hot, exactly like LSH band tuning).
3. **Lossless pre-prune**: ``|len(a)-len(b)| <= d`` is a lower bound
   on edit distance, so the length filter drops pairs BEFORE the
   O(len^2) levenshtein evaluation without changing the result.

Spark's ``levenshtein`` and DuckDB's agree (classic Wagner-Fischer,
no transpositions), which makes the whole operator hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

EDIT_MAX = 2  # pair threshold


@register(
    "entity_resolution_parts",
    oracle=f"""
    WITH d AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(p_partkey) AS BIGINT) AS rep_key
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
    FROM d a JOIN d b
      ON a.blk = b.blk AND a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= {EDIT_MAX}
     AND levenshtein(a.p_name, b.p_name) <= {EDIT_MAX}
    """,
    doc=f"Fuzzy part-name pairs (edit distance <= {EDIT_MAX}) via "
    "exact-collapse -> block on the head noun -> length-band prune -> "
    "levenshtein on surviving candidates only. Quadratic work is "
    "bounded per block over DISTINCT names, never over raw rows; the "
    "length prune is a lossless lower bound on edit distance.",
    tags=["dedup", "entity"],
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "part")
        .groupBy("p_name", F.expr("split_part(p_name, ' ', 2)").alias("blk"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("p_partkey").alias("rep_key"),
        )
    )
    a = d.select(
        F.col("p_name").alias("name_a"),
        F.col("blk"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = d.select(
        F.col("p_name").alias("name_b"),
        F.col("blk"),
        F.col("n_rows").alias("n_rows_b"),
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= EDIT_MAX
            )
        )
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("edit_dist") <= EDIT_MAX)
        .select("name_a", "name_b", "edit_dist", "n_rows_a", "n_rows_b")
    )
