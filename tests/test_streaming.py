"""Streaming tests: the streaming twins must agree with their batch
counterparts on bounded input (the engine-vs-oracle technique applied
stream-vs-batch), and the stateful KV fold must match the batch fold."""

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import kv
from mapreduce_framework_in_go_spark.registry import all_queries
from mapreduce_framework_in_go_spark.sources import tables
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


def test_sliding_window_overlap_and_totals(spark, sf_dir):
    """Each event lands in exactly width/slide=2 sliding windows: the
    sliding counts must sum to 2x the tumbling counts per event_type."""
    events = sw.events_stream(spark, f"{sf_dir}/events.parquet")
    sld = sw.sliding_agg_stream(events)
    q = (
        sld.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_type"]: r["total_n"]
        for r in spark.sql(
            "SELECT event_type, sum(n) AS total_n FROM sliding_stream GROUP BY 1"
        ).collect()
    }
    base = {
        r["event_type"]: r["n"]
        for r in SPECS["events_hourly_agg"]
        .fn(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert got == {k: 2 * v for k, v in base.items()}


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than the watermark horizon (1h) must be dropped in
    append mode; a fresh row in the same late batch survives. Note the
    two-watermark semantics of Spark >= 3.4 (SPARK-42376): stateful
    operators filter late EVENTS with the PREVIOUS micro-batch's
    watermark and evict with the current one — so the late row must
    arrive two batches after the data that advanced the watermark."""
    import pandas as pd

    src = tmp_path / "late_stream"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def mk(event_ids, hours, types):
        return pd.DataFrame(
            {
                "event_id": event_ids,
                "ts": [(t0 + pd.Timedelta(hours=h)).value for h in hours],
                "user_id": [1] * len(event_ids),
                "event_type": types,
                "value": [1.0] * len(event_ids),
                "props": ["{}"] * len(event_ids),
            }
        )

    batches = [
        mk([1, 2], [0, 3], ["click", "click"]),  # watermark -> 14:00 after this
        mk([3], [4], ["advance"]),  # previous-batch watermark now 14:00
        mk([4, 5], [0, 5], ["late", "fresh"]),  # 12:00 row is below 14:00
    ]
    for i, b in enumerate(batches):
        p = src / f"b{i}.parquet"
        b.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    events = sw.events_stream(spark, str(src))
    agg = sw.hourly_agg_stream(events)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_stream_q")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    types = {
        r["event_type"] for r in spark.sql("SELECT * FROM late_stream_q").collect()
    }
    assert "late" not in types
    # batch1's 12:00 window closed when max ts hit 15:00/16:00
    assert "click" in types


def test_kv_foreachbatch_upsert_matches_batch_fold(spark, sf_dir, tmp_path):
    ops = kv.kv_ops(spark, sf_dir).orderBy("seq")
    pdf = ops.toPandas()
    src = tmp_path / "ops_src"
    src.mkdir()
    chunk = len(pdf) // 2 + 1
    for i in range(2):
        p = src / f"c{i}.parquet"
        pdf.iloc[i * chunk : (i + 1) * chunk].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    ops_stream = (
        spark.readStream.schema(
            "key string, op string, value string, seq long, op_id string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = skv.kv_upsert_foreachbatch(ops_stream, str(tmp_path / "state"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "state" / "state"))
    want = kv.kv_state_fold(spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """The streaming interval join must produce exactly the pairs the
    batch inequality join produces on the same bounded input."""
    events = sw.events_stream(spark, f"{sf_dir}/events.parquet")
    joined = sw.purchase_click_interval_join(events)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT purchase_id, click_id, user_id FROM ssj_stream")

    ev = tables.table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
    assert _canon(got) == _canon(want)


def test_kv_state_stream_survives_restart(spark, sf_dir, tmp_path):
    """Stop the stateful query mid-stream and restart from its
    checkpoint: per-key state (including the dedup watermark) must survive,
    and the final result must equal the batch fold — the streaming form
    of the reference's crash-and-rerun-matches-oracle test."""
    ops = kv.kv_ops(spark, sf_dir).orderBy("seq")
    pdf = ops.toPandas()
    src = tmp_path / "ops_restart"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    half = len(pdf) // 2

    updates_dir = str(tmp_path / "updates")

    def start():
        stream = (
            spark.readStream.schema(
                "key string, op string, value string, seq long, op_id string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

        # memory sink cannot recover from a checkpoint; foreachBatch can
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(updates_dir)

        return (
            skv.kv_state_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    pdf.iloc[:half].to_parquet(src / "c0.parquet", index=False)
    os.utime(src / "c0.parquet", (1_700_000_000, 1_700_000_000))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pdf.iloc[half:].to_parquet(src / "c1.parquet", index=False)
    os.utime(src / "c1.parquet", (1_700_000_001, 1_700_000_001))
    q = start()  # restart from checkpoint; memory sink restarts empty
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    spark.read.parquet(updates_dir).createOrReplaceTempView("kv_restart_updates")
    final = spark.sql(
        """
        SELECT key, value, n_effect_ops FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_effect_ops DESC) rn
          FROM kv_restart_updates
        ) WHERE rn = 1
        """
    )
    want = kv.kv_state_fold(spark, sf_dir)
    # the updates log spans both runs: the last update per key must
    # carry the FULL folded state (proving the checkpoint restored the
    # pre-restart state, including the dedup watermark)
    assert _canon(final) == _canon(want)


def test_streaming_exact_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Stream the documents table with injected duplicate rows; the
    streaming dedup must keep exactly one row per digest — the same
    group set batch dedup_exact produces."""
    from mapreduce_framework_in_go_spark.streaming.dedup_stream import (
        dedup_stream_exact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    pdf = docs.toPandas()
    src = tmp_path / "docs_stream"
    src.mkdir()
    # batch 0: first half; batch 1: second half + re-delivery of the
    # first 20 docs (exact duplicate payloads)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "d0.parquet", index=False)
    import pandas as pd

    dup = pd.concat([pdf.iloc[half:], pdf.iloc[:20]])
    dup.to_parquet(src / "d1.parquet", index=False)
    os.utime(src / "d0.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "d1.parquet", (1_700_000_001, 1_700_000_001))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = dedup_stream_exact(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_q")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT text_md5 FROM dedup_stream_q")
    rows = got.collect()
    digests = [r["text_md5"] for r in rows]
    assert len(digests) == len(set(digests)), "stream emitted duplicate digests"
    want = {
        r["text_md5"]
        for r in SPECS["dedup_exact"].fn(spark, sf_dir).collect()
    }
    assert set(digests) == want


def test_streaming_windowed_dedup_drops_within_horizon_only(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate arriving within the
    1h horizon is dropped; after the digest's state expires past the
    watermark, the same payload is admitted again (the bounded-state
    trade-off, documented in dedup_stream.py)."""
    import pandas as pd

    from mapreduce_framework_in_go_spark.streaming.dedup_stream import (
        dedup_stream_windowed,
    )

    src = tmp_path / "wdedup"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def mk(rows):  # rows: (doc_id, hours_offset, text)
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "ts": pd.Series(
                    [t0 + pd.Timedelta(hours=r[1]) for r in rows]
                ).astype("datetime64[us]"),
                "text": [r[2] for r in rows],
            }
        )

    batches = [
        # X at 12:00, duplicate X at 12:30 (within horizon -> dropped),
        # and a 15:00 row to advance the watermark
        mk([(1, 0, "X"), (2, 0.5, "X"), (3, 3, "adv1")]),
        mk([(4, 4, "adv2")]),  # previous-batch watermark now 14:00
        mk([(5, 5, "X")]),  # X state expired (12:00 < 14:00) -> admitted
    ]
    for i, b in enumerate(batches):
        p = src / f"b{i}.parquet"
        b.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = dedup_stream_windowed(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wdedup_q")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM wdedup_q").collect()
    )
    # doc 2 (dup within horizon) dropped; doc 5 (dup after expiry) kept
    assert 2 not in emitted
    assert {1, 3, 4, 5} <= set(emitted)


def test_kv_stream_fold_spans_arrow_chunks(spark, tmp_path):
    """Regression: one group's microbatch arrives as multiple Arrow
    chunks; the fold must sort by seq across ALL chunks, not per chunk.
    With per-chunk sorting, an append delivered in a later chunk but
    with an earlier seq would be applied after a put that supersedes
    it."""
    import pandas as pd

    rows = [
        ("a", "append", "A", 1, "op1"),
        ("a", "put", "P", 3, "op3"),
        ("a", "append", "C", 4, "op4"),
        ("a", "append", "B", 2, "op2"),  # earlier seq, later arrow chunk
        ("a", "append", "D", 5, "op5"),
    ]
    src = tmp_path / "chunked_ops"
    src.mkdir()
    pd.DataFrame(
        rows, columns=["key", "op", "value", "seq", "op_id"]
    ).to_parquet(src / "c0.parquet", index=False)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(
            "key string, op string, value string, seq long, op_id string"
        ).parquet(str(src))
        q = (
            skv.kv_state_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("chunked_kv")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["key"]: r["value"]
            for r in spark.sql("SELECT * FROM chunked_kv").collect()
        }
        # seq order: append A, append B, put P (wipes), append C, D
        assert got == {"a": "PCD"}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_ingest_gate_matches_batch_pipeline(spark, sf_dir, tmp_path):
    """The streaming ingestion gate (quality + language + eval-split
    decontamination, all stateless) must keep exactly the docs the
    batch pipeline's front keeps: flag-passing, non-eval, zero eval
    n-gram overlap."""
    from mapreduce_framework_in_go_spark.operators.pipeline import flag_frame
    from mapreduce_framework_in_go_spark.operators.training_prep import EVAL_MOD
    from mapreduce_framework_in_go_spark.streaming.ingest_gate import (
        eval_ngram_set,
        ingest_gate_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = eval_ngram_set(docs)

    pdf = docs.toPandas()
    src = tmp_path / "gate_stream"
    src.mkdir()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "d0.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "d1.parquet", index=False)
    os.utime(src / "d0.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "d1.parquet", (1_700_000_001, 1_700_000_001))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = ingest_gate_stream(stream, ev)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_gate_q")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM ingest_gate_q").collect()}

    contaminated = {
        r["doc_id"] for r in SPECS["decontaminate_ngram"].fn(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]
        for r in flag_frame(docs)
        .where(F.col("pass_q") & F.col("pass_lang") & (F.col("doc_id") % EVAL_MOD != 0))
        .collect()
    } - contaminated
    assert got == want
    assert got, "gate should keep a nonempty survivor set"


class _FakeState:
    """Minimal stand-in for GroupState: exactly the surface _fold_group
    touches (exists/get/update), holding the tuple Spark would persist."""

    def __init__(self):
        self.exists = False
        self.get = None

    def update(self, t):
        self.exists = True
        self.get = t


def _replay_puts(n_ops, batches):
    """Drive the real fold function over n_ops puts on ONE key, every op
    redelivered once (the client-retry duplicate), split into
    ``batches`` seq-ordered microbatches; return the persisted state."""
    import pandas as pd

    rows = []
    for i in range(n_ops):
        rows.append(("k", "put", f"v{i % 97}", i, f"op{i}"))
        rows.append(("k", "put", f"v{i % 97}", i, f"op{i}"))  # redelivery
    state = _FakeState()
    per = len(rows) // batches + 1
    for b in range(batches):
        chunk = rows[b * per : (b + 1) * per]
        pdf = pd.DataFrame(chunk, columns=["key", "op", "value", "seq", "op_id"])
        list(skv._fold_group(("k",), iter([pdf]), state))
    return state.get


def test_kv_state_bounded_after_400_op_replay(spark):
    """The reference bounds KV state explicitly: snapshot ≤ 500 B after
    400 puts on one key (kvraft/test_test.go:676-707), relying on one
    outstanding op per client (kvraft/test_test.go:80-97). The fold's
    dedup state must therefore be O(clients) — the max applied serial —
    not O(ops). Replays 400 puts (each redelivered) on a single key
    through the real fold function and asserts (a) exactly-once
    application, (b) the persisted state fits the reference's 500 B
    snapshot budget, (c) state size does NOT grow with op count."""
    import pickle

    state_400 = _replay_puts(400, batches=4)
    base, appended, n_ops, max_seq = state_400
    assert (base, appended) == ("v" + str(399 % 97), "")
    assert n_ops == 400  # each op applied once despite 800 deliveries
    assert max_seq == 399
    assert len(pickle.dumps(state_400)) <= 500

    # O(1), not O(ops): 10x the ops, identical state footprint
    state_40 = _replay_puts(40, batches=4)
    assert len(pickle.dumps(state_400)) <= len(pickle.dumps(state_40)) + 8


def test_stream_near_dedup_multibatch_matches_batch(spark, sf_dir, tmp_path):
    """The crawl-delta classifier must converge to the batch
    dedup_incremental classification even when the delta arrives
    split across several microbatches (each doc's candidate rows
    derive from its single input row, so verdicts are per-batch
    correct and batch-order independent)."""
    import pandas as pd

    from mapreduce_framework_in_go_spark.streaming import near_dedup as snd

    docs = tables.table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % snd.DELTA_MOD != snd.DELTA_REM)
    delta_pdf = (
        docs.where(F.col("doc_id") % snd.DELTA_MOD == snd.DELTA_REM)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
        .sort_values("doc_id")
    )
    src = tmp_path / "delta_stream"
    src.mkdir()
    third = len(delta_pdf) // 3 + 1
    for i in range(3):
        p = src / f"d{i}.parquet"
        delta_pdf.iloc[i * third : (i + 1) * third].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = snd.near_dedup_stream(
        stream,
        snd.base_band_table(base),
        snd.base_shingle_sets(base),
        snd.base_digest_lookup(base),
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("near_dedup_mb")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM near_dedup_mb")
    want = SPECS["dedup_incremental"].fn(spark, sf_dir)
    assert _canon(got) == _canon(want)


def test_transition_stream_carries_state_across_batches(spark, sf_dir, tmp_path):
    """Stream events in 3 time-ordered chunks: transitions spanning a
    microbatch boundary must still be emitted (the carried last-event
    state), and the total multiset of transitions must equal the batch
    lead-window computation."""
    from mapreduce_framework_in_go_spark.sources.tables import table
    from mapreduce_framework_in_go_spark.streaming import transitions as st

    ev = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros(
                F.col("ts").cast("timestamp")
            ).alias("ts_us"),
            "event_id",
            "event_type",
        )
        .orderBy("ts_us", "event_id")
    )
    pdf = ev.toPandas()
    src = tmp_path / "ev_stream"
    src.mkdir()
    chunk = len(pdf) // 3 + 1
    for i in range(3):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        part.to_parquet(src / f"chunk-{i:03d}.parquet", index=False)
        os.utime(src / f"chunk-{i:03d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # transitions_stream expects an instant ts column; feed ts_us directly
    # through the same grouping fold
    out = stream.groupBy("user_id").applyInPandasWithState(
        st._fold_user,
        outputStructType=st.OUTPUT_SCHEMA,
        stateStructType=st.STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM trans_stream").collect())
    )

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    want_df = (
        ev.select(
            "user_id",
            "ts_us",
            "event_type",
            F.lead("event_type").over(w).alias("nxt"),
            F.lead("ts_us").over(w).alias("nxt_ts"),
        )
        .where(
            F.col("nxt").isNotNull()
            & ((F.col("nxt_ts") - F.col("ts_us")) <= st.SESSION_GAP_US)
        )
        .select(F.col("event_type"), F.col("nxt").alias("next_event_type"))
    )
    want = sorted(map(tuple, want_df.collect()))
    assert got == want and len(got) > 0
    # explicit cross-batch state path: one user, one event per microbatch,
    # within the session gap -- the pair MUST come from carried state
    import pandas as pd

    src2 = tmp_path / "ev_stream2"
    src2.mkdir()
    for i, (ts_us, et) in enumerate([(0, "a"), (60_000_000, "b")]):
        pd.DataFrame(
            {"user_id": [1], "ts_us": [ts_us], "event_id": [i], "event_type": [et]}
        ).to_parquet(src2 / f"chunk-{i:03d}.parquet", index=False)
        os.utime(src2 / f"chunk-{i:03d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
    stream2 = (
        spark.readStream.schema(
            "user_id long, ts_us long, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src2))
    )
    out2 = stream2.groupBy("user_id").applyInPandasWithState(
        st._fold_user,
        outputStructType=st.OUTPUT_SCHEMA,
        stateStructType=st.STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    q2 = (
        out2.writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_stream2")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert [tuple(r) for r in spark.sql("SELECT * FROM trans_stream2").collect()] == [
        ("a", "b")
    ]


def test_events_stream_accepts_string_ts_layout(spark, tmp_path):
    """Defensive: if the generator ships ISO naive strings for ts, the
    streaming probe must normalize them to the same instants as the
    NTZ layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_in_go_spark.streaming.windows import (
        events_stream,
        run_to_completion,
    )

    base = {
        "event_id": pa.array([1, 2], type=pa.int64()),
        "user_id": pa.array([1, 1], type=pa.int64()),
        "event_type": pa.array(["a", "b"], type=pa.string()),
        "value": pa.array([1.0, 2.0], type=pa.float64()),
        "props": pa.array(["{}", "{}"], type=pa.string()),
    }
    t_us = [1_767_323_045_123_456, 1_767_323_046_000_000]
    outs = {}
    for name, ts in {
        "ntz": pa.array(t_us, type=pa.timestamp("us")),
        "str": pa.array(
            ["2026-01-02 03:04:05.123456", "2026-01-02 03:04:06.000000"],
            type=pa.string(),
        ),
    }.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({**base, "ts": ts}), str(d / "events.parquet"))
        ev = events_stream(spark, str(d / "events.parquet"))
        out = run_to_completion(
            ev.selectExpr("event_id", "unix_micros(ts) AS us"),
            f"ts_layout_{name}",
            "append",
        )
        outs[name] = sorted(tuple(r) for r in out.collect())
    assert outs["ntz"] == outs["str"]
    assert outs["ntz"][0][1] == t_us[0]


def test_ingest_release_composition(spark, sf_dir, tmp_path):
    """The composed single-pass ingest-release ledger: (a) the stream
    over a 2-file source equals the identical builder applied to the
    batch read row-for-row, (b) per-stage columns agree with the
    standalone constituent frames, (c) the executed stream plan holds
    ZERO stateful operators (the NB stage is a broadcast fold, not an
    aggregation), and (d) holdout verdicts equal the batch scorer's
    argmax."""
    from mapreduce_framework_in_go_spark.operators.classifier import (
        NB_FOLD,
        _model,
        _scored,
    )
    from mapreduce_framework_in_go_spark.operators.privacy import (
        pii_scrub_frame,
    )
    from mapreduce_framework_in_go_spark.operators.textops import (
        gopher_flags_frame,
        gopher_repetition_frame,
    )
    from mapreduce_framework_in_go_spark.streaming.ingest_release import (
        ingest_release_stream,
        nb_model_row,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _meta, priors, lik, _tc = _model(spark, sf_dir)
    pri = {r["c"]: r["sp"] for r in priors.collect()}
    classes = sorted(pri)
    model = nb_model_row(lik)

    pdf = docs.toPandas()
    src = tmp_path / "release_stream"
    src.mkdir()
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "d0.parquet", index=False)
    pdf.iloc[half:].to_parquet(src / "d1.parquet", index=False)
    os.utime(src / "d0.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "d1.parquet", (1_700_000_001, 1_700_000_001))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = ingest_release_stream(stream, model, classes, pri)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_release_q")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM ingest_release_q")

    # (c) stateless end to end: no state store in any executed batch
    assert progress["stateOperators"] == []

    # (a) stream == the same builder on the batch frame
    batch = ingest_release_stream(docs, model, classes, pri)
    assert rows_canonical(got.columns, got.collect()) == rows_canonical(
        batch.columns, batch.collect()
    )

    # (b) per-stage agreement with the standalone frames
    g = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_flags_frame(docs).collect()
    }
    p = {
        r["doc_id"]: (r["n_email"], r["n_ip"], r["n_phone"], r["scrubbed_md5"])
        for r in pii_scrub_frame(docs).collect()
    }
    rep = {
        r["doc_id"]: r["rep_pass"]
        for r in gopher_repetition_frame(docs).collect()
    }
    rows = got.collect()
    assert len(rows) == len(pdf)
    for r in rows:
        assert r["gopher_pass"] == g[r["doc_id"]]
        assert r["rep_pass"] == rep[r["doc_id"]]
        assert (r["n_email"], r["n_ip"], r["n_phone"], r["scrubbed_md5"]) == p[
            r["doc_id"]
        ]

    # (d) holdout docs: the composed verdict is the batch scorer's argmax
    want = {
        r["doc_id"]: r["c"]
        for r in _scored(spark, sf_dir).where("rn = 1").collect()
    }
    holdout = [r for r in rows if r["doc_id"] % NB_FOLD == 0]
    assert holdout and all(
        r["pred_source"] == want[r["doc_id"]] for r in holdout
    )


def test_keep_collision_guards(spark, sf_dir):
    """keep= names that collide with a frame's computed/intermediate
    columns must raise instead of silently shadowing."""
    from mapreduce_framework_in_go_spark.operators.privacy import (
        pii_scrub_frame,
    )
    from mapreduce_framework_in_go_spark.operators.textops import (
        gopher_flags_frame,
    )

    from mapreduce_framework_in_go_spark.operators.textops import (
        gopher_repetition_frame,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="collide"):
        gopher_flags_frame(docs, keep=("nw",))
    with pytest.raises(ValueError, match="collide"):
        pii_scrub_frame(docs, keep=("t1",))
    with pytest.raises(ValueError, match="collide"):
        gopher_repetition_frame(docs, keep=("wls",))


def test_ingest_release_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    """The composed ingest-release stream into a REAL parquet file sink
    with a checkpoint: stop mid-stream, restart (the second half
    arrives), then restart once more with nothing new. The file sink's
    transaction log must yield exactly one ledger row per document —
    no loss across the restart, no duplication from the idle restart —
    equal to the batch builder's output. The streaming form of the
    reference's crash-and-rerun-matches-oracle contract (C3) for the
    release path; works precisely because the composition is
    append-mode-safe (zero aggregations)."""
    from mapreduce_framework_in_go_spark.operators.classifier import _model
    from mapreduce_framework_in_go_spark.streaming.ingest_release import (
        ingest_release_stream,
        nb_model_row,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _meta, priors, lik, _tc = _model(spark, sf_dir)
    pri = {r["c"]: r["sp"] for r in priors.collect()}
    classes = sorted(pri)
    model = nb_model_row(lik)

    pdf = docs.toPandas()
    src = tmp_path / "release_sink_src"
    src.mkdir()
    ckpt = str(tmp_path / "release_sink_ckpt")
    out_dir = str(tmp_path / "release_sink_out")
    half = len(pdf) // 2

    def start():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, n_chars long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return (
            ingest_release_stream(stream, model, classes, pri)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    pdf.iloc[:half].to_parquet(src / "c0.parquet", index=False)
    os.utime(src / "c0.parquet", (1_700_000_000, 1_700_000_000))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pdf.iloc[half:].to_parquet(src / "c1.parquet", index=False)
    os.utime(src / "c1.parquet", (1_700_000_001, 1_700_000_001))
    q = start()  # restart from checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    q = start()  # idle restart: nothing new, nothing re-emitted
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # reading the sink directory honors its _spark_metadata commit log:
    # only committed files count, so a torn write can never double rows
    got = spark.read.parquet(out_dir)
    assert got.count() == len(pdf)
    assert got.select("doc_id").distinct().count() == len(pdf)
    want = ingest_release_stream(docs, model, classes, pri)
    assert rows_canonical(got.columns, got.collect()) == rows_canonical(
        want.columns, want.collect()
    )


def test_cluster_maintenance_multi_microbatch(spark, tmp_path):
    """Three microbatches fold into the standing assignment one at a
    time (maxFilesPerTrigger=1, one file per batch) and the final state
    equals the from-scratch union clustering: the streaming form of the
    increments-compose property, across real microbatch boundaries."""
    from mapreduce_framework_in_go_spark.operators import dedup
    from mapreduce_framework_in_go_spark.streaming.cluster_maintenance import (
        run_cluster_maintenance,
    )

    def _alpha(i):
        return "".join(chr(ord("a") + int(d)) for d in str(i))

    def _doc(lo):
        return " ".join(f"w{_alpha(lo + j)}" for j in range(25))

    schema = "doc_id long, text string"
    base_rows = [(10, _doc(0)), (11, _doc(2)), (30, _doc(40)), (50, _doc(90))]
    batches = [
        [(101, _doc(0))],                   # near family A
        [(102, _doc(40)), (103, _doc(42))],  # joins 30's family
        [(104, _doc(90)), (105, _doc(200))],  # exact dup of 50 + new
    ]
    src = tmp_path / "delta_stream"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
    base = spark.createDataFrame(base_rows, schema)
    base_labels = dedup._clusters_lsh_frame(base).select(
        "doc_id", "cluster_rep"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    got = run_cluster_maintenance(stream, base, base_labels)
    from mapreduce_framework_in_go_spark.streaming.cluster_maintenance import (
        LAST_RUN_BATCHES,
    )

    assert LAST_RUN_BATCHES["n"] == 3, (
        "fixture lost its power: expected 3 non-empty microbatches, "
        f"got {LAST_RUN_BATCHES['n']} — composition not exercised"
    )
    union = base
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, schema))
    want = dedup._clusters_lsh_frame(union)
    assert {
        (r.doc_id, r.cluster_rep, r.cluster_size) for r in got.collect()
    } == {(r.doc_id, r.cluster_rep, r.cluster_size) for r in want.collect()}


def test_cluster_maintenance_indexed_fold_matches_scratch(spark, tmp_path):
    """Driver-held fold with a STORED base index (base_index=): each
    microbatch merges against the index and advances it (only that
    batch's new-digest reps are sketched; appends checkpointed
    delta-bounded). Final state must equal the from-scratch union
    clustering — the indexed streaming path's correctness pin (the
    registered query uses the index-less stand-in for local speed)."""
    import os as _os

    from mapreduce_framework_in_go_spark.operators import dedup
    from mapreduce_framework_in_go_spark.streaming.cluster_maintenance import (
        run_cluster_maintenance,
    )

    def _alpha(i):
        return "".join(chr(ord("a") + int(d)) for d in str(i))

    def _doc(lo):
        return " ".join(f"w{_alpha(lo + j)}" for j in range(25))

    schema = "doc_id long, text string"
    base_rows = [(10, _doc(0)), (11, _doc(2)), (30, _doc(40)), (50, _doc(90))]
    batches = [
        [(101, _doc(0)), (102, _doc(300))],
        [(103, _doc(40)), (104, _doc(90))],  # near 30 + exact dup of 50
    ]
    src = tmp_path / "ix_stream"
    src.mkdir()
    base = spark.createDataFrame(base_rows, schema)
    base_labels = dedup._clusters_lsh_frame(base).select(
        "doc_id", "cluster_rep"
    )
    index = {
        k: v.localCheckpoint()
        for k, v in dedup.build_cluster_index(base).items()
    }
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
        _os.utime(
            src / f"b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i)
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )
    got = run_cluster_maintenance(
        stream, base, base_labels, base_index=index
    )
    union = base
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, schema))
    want = dedup._clusters_lsh_frame(union)
    assert {
        (r.doc_id, r.cluster_rep, r.cluster_size) for r in got.collect()
    } == {(r.doc_id, r.cluster_rep, r.cluster_size) for r in want.collect()}


def test_cluster_maintenance_state_table_restart(spark, tmp_path):
    """The storage-table state tier (r10 verdict ask #2): standing
    labels + the band/shingle index live in parquet under state_dir
    with a REAL checkpoint. Kill-and-resume matrix: (1) process one
    batch, stop; (2) simulate a crash in the window between the state
    write and the checkpoint commit (delete the commit marker) and
    restart with two more files — the re-delivered batch must be
    detected as already applied (its _SUCCESS) and skipped, the new
    batches folded; (3) idle restart changes nothing. The state read
    back FROM DISK by a fresh consumer equals the from-scratch union
    clustering — the reference's crash-surviving state contract
    (raft/persister.go:53-58, kvraft restart matrix) at corpus scale."""
    import os as _os

    from mapreduce_framework_in_go_spark.operators import dedup
    from mapreduce_framework_in_go_spark.streaming.cluster_maintenance import (
        LAST_RUN_BATCHES,
        read_cluster_assignment,
        run_cluster_maintenance,
    )

    def _alpha(i):
        return "".join(chr(ord("a") + int(d)) for d in str(i))

    def _doc(lo):
        return " ".join(f"w{_alpha(lo + j)}" for j in range(25))

    schema = "doc_id long, text string"
    base_rows = [(10, _doc(0)), (11, _doc(2)), (30, _doc(40)), (50, _doc(90))]
    batches = [
        [(101, _doc(0))],                    # near family A
        [(102, _doc(40)), (103, _doc(42))],  # joins 30's family
        [(104, _doc(90)), (105, _doc(200))],  # exact dup of 50 + new
    ]
    src = tmp_path / "state_stream"
    src.mkdir()
    sd = str(tmp_path / "cluster_state")
    base = spark.createDataFrame(base_rows, schema)
    base_labels = dedup._clusters_lsh_frame(base).select(
        "doc_id", "cluster_rep"
    )

    def _write_file(i):
        spark.createDataFrame(batches[i], schema).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
        _os.utime(
            src / f"b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i)
        )

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*.parquet"))
        )

    # phase 1: one batch, then stop
    _write_file(0)
    run_cluster_maintenance(_stream(), base, base_labels, state_dir=sd)
    assert LAST_RUN_BATCHES["n"] == 1
    want1 = dedup._clusters_lsh_frame(
        base.unionByName(spark.createDataFrame(batches[0], schema))
    )
    got1 = read_cluster_assignment(spark, sd)
    assert {
        (r.doc_id, r.cluster_rep, r.cluster_size) for r in got1.collect()
    } == {(r.doc_id, r.cluster_rep, r.cluster_size) for r in want1.collect()}

    # phase 2: crash window — state committed, checkpoint commit lost.
    # Spark re-delivers batch 0 on restart; the fold must skip it.
    commit0 = _os.path.join(sd, "checkpoint", "commits", "0")
    assert _os.path.exists(commit0), "checkpoint layout changed"
    _os.remove(commit0)
    crc0 = _os.path.join(sd, "checkpoint", "commits", ".0.crc")
    if _os.path.exists(crc0):
        _os.remove(crc0)
    _write_file(1)
    _write_file(2)
    run_cluster_maintenance(_stream(), base, base_labels, state_dir=sd)
    assert LAST_RUN_BATCHES["skipped"] >= 1, (
        "re-delivered batch was not detected as already applied"
    )
    assert LAST_RUN_BATCHES["n"] == 2

    # phase 3: idle restart — nothing new, nothing re-applied
    final = run_cluster_maintenance(
        _stream(), base, base_labels, state_dir=sd
    )
    assert LAST_RUN_BATCHES["n"] == 0
    assert LAST_RUN_BATCHES["skipped"] == 0

    union = base
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, schema))
    want = {
        (r.doc_id, r.cluster_rep, r.cluster_size)
        for r in dedup._clusters_lsh_frame(union).collect()
    }
    # the in-flight return AND a fresh from-disk read both land there
    assert {
        (r.doc_id, r.cluster_rep, r.cluster_size) for r in final.collect()
    } == want
    assert {
        (r.doc_id, r.cluster_rep, r.cluster_size)
        for r in read_cluster_assignment(spark, sd).collect()
    } == want


def test_warc_ingest_restart_matrix(spark, tmp_path):
    """The custom-container exactly-once protocol (streaming/
    warc_ingest.py): (1) two microbatches commit two sealed batch dirs;
    (2) crash in the window between the seal and the checkpoint commit
    — the replayed batch is detected sealed and SKIPPED while a newly
    arrived file folds; (3) crash INSIDE a batch (seal missing) — the
    replay rewrites the shards byte-identically and seals; (4) idle
    restart changes nothing. After every step the read-back equals the
    set of delivered documents exactly once."""
    import os as _os

    from mapreduce_framework_in_go_spark.streaming.warc_ingest import (
        LAST_INGEST,
        read_ingested,
        run_warc_ingest,
    )

    schema = "doc_id long, text string"
    src = tmp_path / "docs"
    src.mkdir()
    out = str(tmp_path / "arch")
    ckpt = str(tmp_path / "ckpt")

    def _add(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
        _os.utime(
            src / f"b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i)
        )

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*.parquet"))
        )

    def _ids():
        rows = read_ingested(spark, out).collect()
        got = sorted(r.doc_id for r in rows)
        assert len(set(got)) == len(got), f"duplicated records: {got}"
        return got

    _add(0, [(1, "aa"), (2, "bb")])
    _add(1, [(3, "cc"), (6, "dd")])
    run_warc_ingest(_stream(), out, ckpt, shards=2)
    assert LAST_INGEST == {"batches": 2, "skipped": 0}
    assert _ids() == [1, 2, 3, 6]

    # (2) seal-then-crash window: drop the newest checkpoint commit so
    # the last batch replays, and deliver one new file
    def _drop_last_commit():
        commits = sorted(
            c for c in _os.listdir(_os.path.join(ckpt, "commits"))
            if not c.startswith(".")
        )
        _os.remove(_os.path.join(ckpt, "commits", commits[-1]))
        crc = _os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
        if _os.path.exists(crc):  # stale checksum reads as concurrent use
            _os.remove(crc)

    _drop_last_commit()
    _add(2, [(5, "ee")])
    run_warc_ingest(_stream(), out, ckpt, shards=2)
    assert LAST_INGEST["skipped"] >= 1 and LAST_INGEST["batches"] == 1
    assert _ids() == [1, 2, 3, 5, 6]

    # (3) crash INSIDE the last batch: seal missing, commit missing —
    # the replay rewrites byte-identical shards and seals again
    bdirs = sorted(
        d for d in _os.listdir(out) if d.startswith("batch-")
    )
    last = _os.path.join(out, bdirs[-1])
    before = {
        f: open(_os.path.join(last, f), "rb").read()
        for f in _os.listdir(last)
        if f.endswith(".warc.gz")
    }
    _os.remove(_os.path.join(last, "_SUCCESS"))
    _drop_last_commit()
    run_warc_ingest(_stream(), out, ckpt, shards=2)
    assert LAST_INGEST["batches"] == 1  # the rewrite-and-seal
    after = {
        f: open(_os.path.join(last, f), "rb").read()
        for f in _os.listdir(last)
        if f.endswith(".warc.gz")
    }
    assert after == before  # byte-identical replay
    assert _ids() == [1, 2, 3, 5, 6]

    # (4) idle restart: nothing new, nothing replayed
    run_warc_ingest(_stream(), out, ckpt, shards=2)
    assert LAST_INGEST == {"batches": 0, "skipped": 0}
    assert _ids() == [1, 2, 3, 5, 6]


def test_stream_cms_state_is_sketch_bounded(spark, sf_dir):
    """The streaming CMS aggregation's state must be bounded by the
    sketch dimensions (D*W cells), NOT by the stream's token volume —
    the property that makes a turnstile sketch viable at ingest. The
    registered query already hash-checks the final counts against the
    batch oracle; here we additionally read the state-store metrics
    from the completed run."""
    from pyspark.sql import functions as F

    from mapreduce_framework_in_go_spark.functions.text import tokens_col
    from mapreduce_framework_in_go_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        cms_cells_frame,
    )
    from mapreduce_framework_in_go_spark.operators.streaming_queries import (
        _docs_stream,
    )

    stoks = _docs_stream(spark, str(sf_dir)).select(
        F.explode(tokens_col("text")).alias("tok")
    )
    cms = cms_cells_frame(stoks).groupBy("d", "b").agg(
        F.count("*").alias("cnt")
    )
    spark.catalog.dropTempView("cms_state_probe")
    q = (
        cms.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_state_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        state_rows = [
            op["numRowsTotal"]
            for op in (q.lastProgress or {}).get("stateOperators", [])
        ]
    finally:
        q.stop()
    assert state_rows and max(state_rows) <= CMS_D * CMS_W
    got = spark.table("cms_state_probe")
    assert got.count() <= CMS_D * CMS_W
    # token volume is orders of magnitude above the state bound: the
    # bound is doing real work, not vacuously true
    n_toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(tokens_col("text")).alias("t"))
        .count()
    )
    assert n_toks > CMS_D * CMS_W * 4
