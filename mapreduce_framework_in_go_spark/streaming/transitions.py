"""Streaming extraction of per-user event transitions — the
incremental form of ``event_transition_matrix`` (operators/temporal.py).

A batch lead() window cannot run on a stream (it would need the whole
partition); the streaming-native shape is a per-user stateful fold:
state carries the user's LAST event (type + epoch micros), each
microbatch walks the user's new events in (ts, event_id) order and
emits one row per consecutive pair within the 30-minute session gap.
Cross-batch pairs come for free from the carried state — the transition
spanning a microbatch boundary is emitted by the later batch.

Delivery contract (same as streaming/kv_state.py): batches arrive in
time order per user (the bounded-parquet driver trivially satisfies
this; a production out-of-order transport would buffer events in state
until the watermark passes them — omitted, as with the KV fold).

State is O(1) per user (one type + one timestamp), the bound the
reference's KV tier demands of its own state
(``kvraft/test_test.go:676-707``). Timestamps are folded as epoch
MICROSECOND integers so the state and the gap comparison are
session-timezone independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("next_event_type", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_et", T.StringType()),
    ]
)


def _fold_user(key: tuple, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_et = state.get
    else:
        last_ts, last_et = None, None
    chunks = list(pdf_iter)
    if len(chunks) > 1:
        pdf = pd.concat(chunks)
    elif chunks:
        pdf = chunks[0]
    else:
        pdf = pd.DataFrame(columns=["user_id", "ts_us", "event_id", "event_type"])
    src, dst = [], []
    for row in pdf.sort_values(["ts_us", "event_id"]).itertuples(index=False):
        if last_et is not None and row.ts_us - last_ts <= SESSION_GAP_US:
            src.append(last_et)
            dst.append(row.event_type)
        last_ts, last_et = row.ts_us, row.event_type
    if last_et is not None:
        state.update((int(last_ts), last_et))
    yield pd.DataFrame({"event_type": src, "next_event_type": dst})


def transitions_stream(ev: DataFrame) -> DataFrame:
    """(event_type, next_event_type) rows from a streaming events frame
    (needs ts as an instant; event_id for the deterministic tie-break)."""
    keyed = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _fold_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
