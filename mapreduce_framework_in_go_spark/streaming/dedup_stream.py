"""Streaming deduplication — the ingest-time twin of the batch dedup
operators (operators/dedup.py): as documents flow in, drop exact
duplicates by content digest.

Two forms:

- ``dedup_stream_exact``: ``dropDuplicates`` on the digest — state
  holds every digest seen since the stream started. Correct and
  complete, but state grows with the corpus; right when the pipeline
  re-ingests bounded corpora.
- ``dedup_stream_windowed``: ``dropDuplicatesWithinWatermark`` — only
  digests within the watermark horizon are retained, so state is
  bounded by (arrival rate x horizon). Right for unbounded ingestion
  where duplicates cluster in time (retries, crawler revisits), the
  production shape at 100 TB/day.

Near-dup streaming (MinHash bands as the dedup key) composes the same
way: map to band signatures, dropDuplicatesWithinWatermark on the
signature — the batch signature pipeline is reused verbatim because it
is all stateless column work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_digest(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("text_md5", F.md5(F.col(text_col)))


def dedup_stream_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the first arrival of each distinct content digest
    (unbounded digest state)."""
    return with_digest(docs, text_col).dropDuplicates(["text_md5"])


def dedup_stream_windowed(
    docs: DataFrame, ts_col: str = "ts", horizon: str = "1 hour", text_col: str = "text"
) -> DataFrame:
    """Keep the first arrival per digest within the watermark horizon —
    bounded state for unbounded streams."""
    return (
        with_digest(docs, text_col)
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
