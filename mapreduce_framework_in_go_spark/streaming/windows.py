"""Structured Streaming windowed operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.2 "Streaming:
none"), but its declared KV tier is a continuously-updated state table —
and the north-star extensions want real stream processing. These are the
streaming twins of the batch queries in operators/relational.py
(events_hourly_agg, events_sessionization): same logical result on a
bounded input, verified in tests/test_streaming.py.

Scale notes: watermarks bound state (late rows beyond 1h are dropped —
the knob the reference never had); windowed aggregation state lives in
the state store (RocksDB on a real cluster), partitioned by group key;
`availableNow` triggers let the same query run incrementally over a
growing parquet directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.relational import fsum

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """Explicit schema (streaming sources never infer); the ts physical
    type is probed from the file so both the legacy raw-nanos layout and
    the current micros TIMESTAMP_NTZ layout work (see sources/tables.py)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the events parquet, ts normalized to an instant."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # Probe the on-disk ts type with a metadata-only batch read, then
    # declare the matching streaming schema.
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    # FileStreamSource requires a directory basePath; the testdata tables
    # are single files, so a trailing glob makes Spark infer the parent
    # directory as basePath while still matching only this table.
    import os

    if not os.path.isdir(path):
        path = path + "*"
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    # Watermarks require TimestampType (instant), not TIMESTAMP_NTZ —
    # both conversions are exact integer arithmetic on epoch micros,
    # treating the naive wall clock as UTC regardless of session TZ.
    # Downstream rendering goes through _utc_str, so the whole stream
    # is session-timezone independent (the driver's session may not
    # pin UTC).
    if isinstance(ts_type, T.LongType):
        # same footer-stat unit inference as the batch loader — a bare
        # INT64 column is not necessarily nanos (see sources/tables.py)
        from ..sources.tables import _int64_ts_micros_expr

        micros = _int64_ts_micros_expr(path.rstrip("*"))
        return raw.withColumn("ts", F.timestamp_micros(F.expr(micros)))
    if isinstance(ts_type, (T.TimestampNTZType, T.StringType)):
        # string layout (defensive): NTZ cast first — TZ-free — then
        # the same NTZ -> instant epoch re-base
        ntz = (
            "ts" if isinstance(ts_type, T.TimestampNTZType)
            else "CAST(ts AS TIMESTAMP_NTZ)"
        )
        return raw.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ntz})"
                )
            ),
        )
    return raw


def _utc_str(col: str, fmt: str) -> F.Column:
    """Render an instant column's UTC wall clock, independent of the
    session timezone: re-base the epoch micros onto an NTZ epoch (NTZ
    date_format is TZ-free). A bare date_format(instant) would render
    in the session zone — wrong under a non-UTC driver session, since
    window arithmetic itself is pure epoch math (UTC-aligned)."""
    return F.date_format(
        F.expr(
            f"timestampadd(MICROSECOND, unix_micros({col}), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ),
        fmt,
    )


def hourly_agg_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window with a 1-hour watermark: count + exact
    fixed-point sum per (window, event_type). Streaming twin of the
    batch `events_hourly_agg` query."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            fsum(F.col("value"), 100).alias("total_value"),
        )
        .select(
            _utc_str("window.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with a 30-minute gap per user: the built-in
    streaming analogue of the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            _utc_str("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def sliding_agg_stream(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding window count/sum per event_type: each event lands in
    width/slide overlapping windows (2 here). State is bounded by the
    watermark exactly as the tumbling case; the overlap factor is the
    only extra state cost."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide), "event_type")
        .agg(
            F.count("*").alias("n"),
            fsum(F.col("value"), 100).alias("total_value"),
        )
        .select(
            _utc_str("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def purchase_click_interval_join(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase paired with the same
    user's clicks from the preceding hour. Both sides carry watermarks
    and the join has two-sided time bounds — the conditions Spark needs
    to expire join state (clicks older than purchase-side watermark -
    1h are dropped from the state store). The streaming twin of the
    batch range_join_pre_purchase."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))


def run_to_completion(df: DataFrame, query_name: str, output_mode: str) -> DataFrame:
    """Drive a streaming frame over a bounded source to completion into
    an in-memory table; returns the result as a batch DataFrame.

    ``output_mode`` is deliberately required: ``complete`` for
    aggregated frames (``append`` would silently withhold every window
    not yet past the final watermark), ``append`` for non-aggregated
    frames (joins, dedup — ``complete`` is rejected by Spark there).
    """
    spark = df.sparkSession
    # callers reuse fixed sink names across invocations; drop the stale
    # view so the catalog holds at most one materialized result per name
    spark.catalog.dropTempView(query_name)
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
