"""Interchange formats beyond parquet: JSONL and CSV round-trips.

The reference's source surface is whole text files + its `"key value"`
sink (``mr/worker.go:56-82``); real corpus ingest adds line-delimited
JSON (the de-facto crawl/LLM-corpus interchange format) and CSV. These
helpers pin the schema contracts that make those formats safe at scale:

- **JSONL**: written/read with an EXPLICIT schema — schema inference
  reads the whole input once before the real scan (a second 100 TB
  pass) and silently widens types on dirty data; production always
  declares the schema. Timestamps serialize as ISO-8601 instants
  (``timestampFormat`` below) so the round-trip is session-timezone
  independent.
- **CSV**: header + explicit schema + ``mode=FAILFAST``; permissive
  mode silently nulls malformed rows — at a trillion rows that is data
  loss with no error. Strings containing the delimiter/quotes rely on
  quoting, exercised by the documents corpus round-trip test.

Both formats split by LINE on a cluster (a single huge file still
parallelizes), but stay row-oriented: no column pruning, no predicate
pushdown, no encoding — the scan reads every byte every query. The
round-trip tests (tests/test_formats.py) prove lossless conversion to
parquet, which is the only format the engine's query surface reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_OPTS = {
    "timestampFormat": TS_FMT,
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(**_OPTS, mode="FAILFAST")
        .json(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(header=True, **_OPTS).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """``multiline=True`` is required to read back quoted fields that
    CONTAIN newlines — but it makes each file non-splittable (one task
    per file, no line-level parallelism), the classic CSV scale trap.
    Corpora with embedded newlines belong in parquet/JSONL; the flag
    exists for ingesting third-party CSVs, sized-by-file."""
    return (
        spark.read.schema(schema)
        .options(header=True, mode="FAILFAST", multiLine=multiline, **_OPTS)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, bloom_columns: str = "") -> None:
    """ORC sink — the columnar interchange format for engines outside
    the parquet ecosystem (Hive/Trino warehouses). Unlike JSONL/CSV,
    ORC keeps the parquet-class scale properties: column pruning,
    predicate pushdown to stripe/row-group stats, splittable stripes,
    and optional per-column bloom filters (``bloom_columns`` —
    comma-separated names) that let point-lookup scans skip stripes a
    min/max range check cannot rule out."""
    w = df.write.mode("overwrite")
    if bloom_columns:
        w = w.option("orc.bloom.filter.columns", bloom_columns)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with an EXPLICIT schema (same contract as read_jsonl:
    no inference pass). Filters and projections push down to the ORC
    reader exactly as with parquet — asserted by plan test."""
    return spark.read.schema(schema).orc(path)
