"""Small-file compaction planning — the table-maintenance operator that
keeps a 100 TB lake scannable.

Ingest (streaming sinks, per-partition writers, CDC appends) leaves
thousands of undersized files per table partition; every query then
pays listing + footer + task-schedule overhead per file. Compaction
(Delta/Iceberg OPTIMIZE, Hive concatenate) rewrites each partition's
small files into ~target-size outputs. The PLANNING step is pure
dataflow and that is what this operator computes: group input segments
into output bins, concat-then-split — segments are taken in a
deterministic order within their table partition and a bin closes as
the cumulative size crosses the target, so no segment is ever split
and each bin overflows by at most one segment (the same guarantee a
greedy packer gives, expressed as a cumulative-sum window instead of a
sequential loop).

Input "files" are modeled from the documents table: one segment per
(source, doc_id block) with its real byte payload. Per table partition
(source) the plan is an independent window — parallel across
partitions, and a pathological mega-partition would range-split its
cumsum exactly like pack_sequences. Output: one row per planned output
file with its segment count, byte size, and utilization against the
target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

SEG_SPAN = 50  # doc_id block width per modeled input segment
TARGET_BYTES = 20_000  # compaction target per output file


@register(
    "compact_plan",
    oracle=f"""
    WITH segs AS (
      SELECT source, doc_id // {SEG_SPAN} AS seg,
             CAST(sum(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1, 2
    ),
    placed AS (
      SELECT source, seg, bytes,
             (sum(bytes) OVER (
                PARTITION BY source ORDER BY seg
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - bytes) // {TARGET_BYTES} AS bin
      FROM segs
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           round(sum(bytes) * 1.0 / {TARGET_BYTES}, 4) AS utilization
    FROM placed GROUP BY 1, 2
    """,
    doc=f"Compaction plan: per-source input segments ({SEG_SPAN}-doc "
    f"blocks with real byte sizes) packed into ~{TARGET_BYTES}-byte "
    "output files by closing a bin as the running size crosses the "
    "target — bin id = floor(preceding-bytes / target), the greedy "
    "no-split packing as one cumsum window per table partition. "
    "tests/test_extensions.py pins the packing guarantees: full bins "
    "waste less than one trailing segment, nothing is split, order is "
    "preserved.",
    tags=["layout", "maintenance"],
)
def compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    segs = docs.groupBy(
        "source", (F.col("doc_id") / SEG_SPAN).cast("long").alias("seg")
    ).agg(F.sum("n_chars").cast("long").alias("bytes"))
    return plan_bins(segs, TARGET_BYTES)


def plan_bins(segs: DataFrame, target: int) -> DataFrame:
    """Greedy no-split packing of (source, seg, bytes) segments into
    ~``target``-byte bins: one cumsum window per source partition."""
    w = (
        Window.partitionBy("source")
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = segs.withColumn(
        "bin",
        ((F.sum("bytes").over(w) - F.col("bytes")) / target).cast("long"),
    )
    return placed.groupBy("source", "bin").agg(
        F.count("*").alias("n_segments"),
        F.sum("bytes").alias("bytes"),
        F.round(F.sum("bytes") / target, 4).alias("utilization"),
    )
