"""Distributed linearizability checking — the porcupine decision
procedure as a Spark grouped map.

The KV model partitions histories by key (a history is linearizable
iff every per-key subhistory is — ``/root/reference/models/kv.go:17``),
and that partition function IS the Spark partitioning: the history
lands in a DataFrame, ``groupBy(key).applyInPandas`` ships each key's
subhistory to one task, and the pure-Python WGL checker
(``linearizability.py``) decides each group independently. At fleet
scale (billions of recorded client operations across millions of
keys) this is exactly the shape you want — the search is exponential
in per-key contention, never in history size, and keys check in
parallel with no cross-key shuffle beyond the one hash exchange.

The registered query generates a deterministic concurrent history
(fixed seed; call/return intervals overlap across clients, mirroring
the recording loop in ``/root/reference/kvraft/test_test.go:341-370``)
and plants one violation: the last get on one key observes a value no
write produced. The verdict table must show exactly that key as
non-linearizable. No SQL oracle exists for a backtracking decision
procedure, so this is a rows-only entry; the full accept/reject
semantics are covered by tests/test_linearizability.py.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..linearizability import (
    GET,
    KvOp,
    _check_one_key,
    generate_history,
)
from ..registry import register

HISTORY_SEED = 20260813
N_CLIENTS = 12
N_OPS = 600
N_KEYS = 6
TAMPERED_KEY = "k3"


def _ops_from_pandas(pdf: pd.DataFrame) -> list[KvOp]:
    return [
        KvOp(
            int(r.client_id),
            int(r.op),
            r.key,
            r.value,
            r.output,
            int(r.call),
            int(r.ret),
        )
        for r in pdf.itertuples()
    ]


def _verdict(pdf: pd.DataFrame) -> pd.DataFrame:
    ops = _ops_from_pandas(pdf)
    return pd.DataFrame(
        {
            "key": [pdf["key"].iloc[0]],
            "n_ops": [len(ops)],
            "n_clients": [pdf["client_id"].nunique()],
            "linearizable": [_check_one_key(ops)],
        }
    )


def history_frame(spark: SparkSession, ops: Iterable[KvOp]) -> DataFrame:
    """A recorded history as a DataFrame — the shape a fleet harness
    would log to parquet (one row per timed client operation)."""
    return spark.createDataFrame(
        [(o.client_id, o.op, o.key, o.value, o.output, o.call, o.ret) for o in ops],
        "client_id long, op int, key string, value string, output string, "
        "call long, ret long",
    )


def check_frame(hist: DataFrame) -> DataFrame:
    """(key, n_ops, n_clients, linearizable): per-key verdicts via
    grouped-map WGL. One shuffle on key; verdicts are one row per key."""
    return hist.groupBy("key").applyInPandas(
        _verdict,
        schema="key string, n_ops long, n_clients long, linearizable boolean",
    )


def _tamper_last_get(ops: list[KvOp], key: str) -> list[KvOp]:
    from ..linearizability import corrupt_get

    return corrupt_get(
        ops, max(i for i, o in enumerate(ops) if o.key == key and o.op == GET)
    )


@register(
    "kv_linearizability",
    oracle=None,  # backtracking decision procedure — not SQL-expressible
    doc="Per-key linearizability verdicts over a deterministic "
    f"concurrent {N_CLIENTS}-client KV history ({N_OPS} timed ops, "
    "overlapping call/return intervals) with one planted violation "
    f"(the last get on {TAMPERED_KEY} observes a value never written). "
    "WGL checker as a grouped map: partition-by-key soundness is the "
    "reference KV model's own partition function, so the check "
    "distributes with one shuffle.",
    tags=["kv"],
)
def kv_linearizability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = generate_history(
        n_clients=N_CLIENTS, n_ops=N_OPS, n_keys=N_KEYS, seed=HISTORY_SEED
    )
    ops = _tamper_last_get(ops, TAMPERED_KEY)
    return check_frame(history_frame(spark, ops))
