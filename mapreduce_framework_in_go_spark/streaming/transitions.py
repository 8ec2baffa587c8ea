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


# shared per-worker empty result: groups with no qualifying pair are
# the common case at small batch sizes, and building a fresh DataFrame
# per group was measurable across ~10^4 user groups per microbatch
_EMPTY = pd.DataFrame(
    {"event_type": pd.Series(dtype=object),
     "next_event_type": pd.Series(dtype=object)}
)


def _fold_user(key: tuple, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    import numpy as np

    chunks = list(pdf_iter)
    if len(chunks) > 1:
        pdf = pd.concat(chunks)
    elif chunks:
        pdf = chunks[0]
    else:  # no new events: state carries unchanged, nothing to emit
        yield _EMPTY
        return
    # the fold is a pure neighbor comparison, so it vectorizes exactly
    # (r13: the itertuples row loop was the addBatch hot path at 100k
    # rows/batch; numpy lexsort beats pandas sort_values at per-group
    # sizes): prepend the carried state as a virtual row 0, pair
    # consecutive events, keep pairs within the session gap.
    ts = pdf["ts_us"].to_numpy(dtype=np.int64, copy=False)
    eid = pdf["event_id"].to_numpy(dtype=np.int64, copy=False)
    et = pdf["event_type"].to_numpy()
    order = np.lexsort((eid, ts))
    ts = ts[order]
    et = et[order]
    if state.exists:
        last_ts, last_et = state.get
        ts = np.concatenate([np.array([last_ts], dtype=np.int64), ts])
        et = np.concatenate([np.array([last_et], dtype=object), et])
    state.update((int(ts[-1]), str(et[-1])))
    mask = (ts[1:] - ts[:-1]) <= SESSION_GAP_US
    if not mask.any():
        yield _EMPTY
        return
    yield pd.DataFrame(
        {"event_type": et[:-1][mask], "next_event_type": et[1:][mask]}
    )


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
