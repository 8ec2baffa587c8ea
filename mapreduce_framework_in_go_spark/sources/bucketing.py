"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the fact-fact join (lineitem x orders) is the dominant
shuffle. Bucketing both tables by the join key at WRITE time moves that
shuffle out of every query and into the (one-time) ingest: Spark's scan
reports the bucket hash as the output partitioning, the join planner
sees both sides pre-partitioned on the key, and the exchange disappears
from the plan (asserted in tests/test_bucketing.py). Same trick the
reference plays with its fixed NReduce=10 hash routing
(``mr/worker.go:62-64``) — except here the layout is persistent and
every later query benefits.

Sort-within-buckets additionally lets the join run as a merge without
a per-task sort when bucket counts match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) table in
    the session warehouse. ``n_buckets`` plays the role of the
    reference's NReduce: fixed at write time, shared by every reader."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    zero exchanges (bucket layout == join partitioning)."""
    return spark.table(left_table).join(spark.table(right_table), on)
