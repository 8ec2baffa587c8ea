"""Streaming tests: the streaming twins must agree with their batch
counterparts on bounded input (the engine-vs-oracle technique applied
stream-vs-batch), and the stateful KV fold must match the batch fold."""

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import kv
from mapreduce_framework_in_go_spark.registry import all_queries
from mapreduce_framework_in_go_spark.streaming import kv_state as skv
from mapreduce_framework_in_go_spark.streaming import windows as sw

from .oracle import rows_canonical

SPECS = all_queries()


def _canon(df):
    return rows_canonical(df.columns, [tuple(r) for r in df.collect()])


def test_hourly_agg_stream_matches_batch(spark, sf_dir, tmp_path):
    events = sw.events_stream(spark, f"{sf_dir}/events.parquet")
    agg = sw.hourly_agg_stream(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM hourly_stream")
    want = SPECS["events_hourly_agg"].fn(spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_session_window_stream_matches_batch_sessionization(spark, sf_dir):
    events = sw.events_stream(spark, f"{sf_dir}/events.parquet")
    sess = sw.session_window_stream(events)
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT user_id, session_start, n_events FROM session_stream")
    want = SPECS["events_sessionization"].fn(spark, sf_dir).select(
        "user_id", "session_start", "n_events"
    )
    assert _canon(got) == _canon(want)


def test_kv_state_stream_matches_batch_fold(spark, sf_dir, tmp_path):
    """Stream the ops log in 3 seq-ordered chunks through
    applyInPandasWithState; final per-key state must equal the batch
    fold (exactly-once under the injected duplicate deliveries)."""
    ops = kv.kv_ops(spark, sf_dir).orderBy("seq")
    total = ops.count()
    chunk = total // 3 + 1
    pdf = ops.toPandas()
    src = tmp_path / "ops_stream"
    src.mkdir()
    for i in range(3):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        part.to_parquet(src / f"chunk-{i:03d}.parquet", index=False)
        # strictly increasing mtimes so the file source triggers in order
        os.utime(src / f"chunk-{i:03d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    ops_stream = (
        spark.readStream.schema(
            "key string, op string, value string, seq long, op_id string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = skv.kv_state_stream(ops_stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kv_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode appends one row per key per batch — the final state per
    # key is the one with the highest n_effect_ops
    final = spark.sql(
        """
        SELECT key, value, n_effect_ops FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_effect_ops DESC) rn
          FROM kv_stream
        ) WHERE rn = 1
        """
    )
    want = kv.kv_state_fold(spark, sf_dir)
    assert _canon(final) == _canon(want)
