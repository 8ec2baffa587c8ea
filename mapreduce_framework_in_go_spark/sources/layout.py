"""Output layout management — the ingest-side half of scan performance.

At 100 TB the dominant scan costs are decided at WRITE time:

- **File sizing**: millions of small files drown the driver in listing
  and footer reads; multi-GB files serialize task scheduling.
  ``write_sized`` targets a row budget per file via
  ``maxRecordsPerFile`` plus a repartition so files are neither tiny
  nor monolithic.
- **Sort clustering**: parquet stores min/max stats per file and row
  group; writing range-partitioned-and-sorted by a filter column makes
  those ranges disjoint, so a predicate prunes whole files without
  reading them (poor man's Z-order for the 1-D case, which covers
  time-series scans). ``write_clustered`` does
  ``repartitionByRange(col).sortWithinPartitions(col)``.

Tests (tests/test_layout.py) verify the file-count arithmetic and that
clustered output files have pairwise-disjoint value ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sized(
    df: DataFrame, path: str, rows_per_file: int, approx_total: int | None = None
) -> None:
    """Write parquet with ~rows_per_file rows per output file.

    ``maxRecordsPerFile`` caps file size; the repartition spreads rows
    so the cap actually shapes files (without it, one task could emit
    many capped files while others emit one tiny one).
    """
    if approx_total is None:
        approx_total = df.count()
    # Ceiling division: with floor, each partition carries slightly MORE
    # than rows_per_file and maxRecordsPerFile splits off a tiny
    # remainder file per partition — the opposite of the sizing goal.
    n_parts = max(1, -(-approx_total // rows_per_file))
    (
        df.repartition(n_parts)
        .write.option("maxRecordsPerFile", rows_per_file)
        .mode("overwrite")
        .parquet(path)
    )


def write_clustered(df: DataFrame, path: str, cluster_col: str, n_files: int) -> None:
    """Range-partition + sort by ``cluster_col`` so each output file
    covers a disjoint value range — parquet min/max stats then prune
    whole files for range predicates on that column."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int
) -> None:
    """Cluster output along the Morton curve of two LONG columns so
    each file covers a tight rectangle in (x, y) — min/max footer
    stats then prune files for predicates on EITHER dimension (the 2-D
    counterpart of write_clustered; measured query form:
    operators/zorder.py). Quantization bounds ride a broadcast 1-row
    aggregate; the curve value is map-side integer arithmetic; the
    only exchange is the range partitioning every clustered write
    pays."""
    from ..operators.zorder import Q_BITS, z_interleave

    bounds = df.agg(
        F.min(col_x).alias("xmin"),
        F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"),
        F.max(col_y).alias("ymax"),
    )
    scale = F.lit(1 << Q_BITS)
    qx = (
        (F.col(col_x) - F.col("xmin")) * scale
        / (F.col("xmax") - F.col("xmin") + 1)
    ).cast("long")
    qy = (
        (F.col(col_y) - F.col("ymin")) * scale
        / (F.col("ymax") - F.col("ymin") + 1)
    ).cast("long")
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", z_interleave(qx, qy))
        .drop("xmin", "xmax", "ymin", "ymax")
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark, in_dir: str, out_dir: str, target_bytes: int
) -> list[dict]:
    """Execute small-file compaction: greedy no-split bin packing of
    ``in_dir``'s parquet files (deterministic name order — the
    file-level twin of operators/compaction.py's segment planning),
    then one distributed rewrite job per bin producing exactly one
    output file.

    Returns the executed plan (bin -> files, bytes) for auditing. The
    driver-side part is only the LISTING and bin assignment (metadata,
    the same role the Delta/Iceberg OPTIMIZE coordinator plays); each
    bin's data moves through a distributed read -> coalesce(1) write.
    A bin overflows the target by at most one file, matching the
    planner's guarantee. Correctness contract (tests/test_layout.py):
    row multiset identical, file count == bin count.
    """
    import os

    files = sorted(
        f for f in os.listdir(in_dir) if f.endswith(".parquet")
    )
    bins: list[dict] = []
    cur: dict = {"files": [], "bytes": 0}
    for f in files:
        sz = os.path.getsize(os.path.join(in_dir, f))
        cur["files"].append(os.path.join(in_dir, f))
        cur["bytes"] += sz
        if cur["bytes"] >= target_bytes:
            bins.append(cur)
            cur = {"files": [], "bytes": 0}
    if cur["files"]:
        bins.append(cur)
    for i, b in enumerate(bins):
        (
            spark.read.parquet(*b["files"])
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"bin-{i:05d}"))
        )
        b["bin"] = i
    return bins
