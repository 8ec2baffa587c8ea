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
    APPEND,
    GET,
    PUT,
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


# ---------------------------------------------------------------------------
# SET-projection contract twin: sequential histories ARE SQL-checkable
# ---------------------------------------------------------------------------

# gets whose seq hits this modulus get a deterministically corrupted
# observation (replay || '#') — '#' never occurs in any written value,
# so the corrupted keys are non-linearizable by construction.
CORRUPT_MOD = 97

_CONTRACT_ORACLE = """
    WITH ops AS (
      SELECT chr(97 + CAST(user_id % 50 AS INTEGER) % 26)
               || CAST(user_id % 50 AS VARCHAR)                  AS key,
             CASE WHEN event_type = 'signup'   THEN 'put'
                  WHEN event_type = 'purchase' THEN 'get'
                  ELSE 'append' END                              AS op,
             'v' || CAST(event_id % 97 AS VARCHAR)               AS value,
             event_id                                            AS seq
      FROM events
    ),
    effects AS (SELECT * FROM ops WHERE op <> 'get'),
    gets AS (SELECT * FROM ops WHERE op = 'get'),
    -- sequential semantics: a get at seq observes the fold of every
    -- effect-op before it (last put before it + later appends before it)
    replayed AS (
      SELECT g.key, g.seq,
             coalesce((SELECT e.value FROM effects e
                       WHERE e.key = g.key AND e.op = 'put' AND e.seq < g.seq
                       ORDER BY e.seq DESC LIMIT 1), '')
          || coalesce((SELECT string_agg(a.value, '' ORDER BY a.seq)
                       FROM effects a
                       WHERE a.key = g.key AND a.op = 'append' AND a.seq < g.seq
                         AND a.seq > coalesce((SELECT max(p.seq) FROM effects p
                                               WHERE p.key = g.key AND p.op = 'put'
                                                 AND p.seq < g.seq), -1)), '')
               AS replay
      FROM gets g
    ),
    observed AS (
      SELECT key, seq, replay,
             replay || CASE WHEN seq % {CM} = 0 THEN '#' ELSE '' END AS output
      FROM replayed
    ),
    per_key_gets AS (
      SELECT key,
             CAST(count(*) AS BIGINT) AS n_gets,
             bool_and(output = replay) AS linearizable,
             CAST(('0x' || substr(md5(string_agg(output, '|' ORDER BY seq)), 1, 8))
                  AS BIGINT) AS gets_digest
      FROM observed GROUP BY key
    )
    SELECT o.key,
           CAST(count(*) AS BIGINT)  AS n_ops,
           coalesce(any_value(g.n_gets), 0)        AS n_gets,
           coalesce(any_value(g.linearizable), true) AS linearizable,
           coalesce(any_value(g.gets_digest),
                    CAST(('0x' || substr(md5(''), 1, 8)) AS BIGINT)) AS gets_digest
    FROM ops o LEFT JOIN per_key_gets g USING (key)
    GROUP BY o.key
""".replace("{CM}", str(CORRUPT_MOD))

_OP_CODE = {"get": GET, "put": PUT, "append": APPEND}


def _contract_verdict(pdf: pd.DataFrame) -> pd.DataFrame:
    import hashlib

    pdf = pdf.sort_values("seq")
    gets = pdf[pdf["op"] == "get"]
    digest = int(hashlib.md5("|".join(gets["output"]).encode()).hexdigest()[:8], 16)
    ops = [
        KvOp(
            int(r.client_id),
            _OP_CODE[r.op],
            r.key,
            r.value,
            r.output,
            int(2 * r.seq),       # sequential: intervals never overlap,
            int(2 * r.seq + 1),   # so call order is the only linearization
        )
        for r in pdf.itertuples()
    ]
    return pd.DataFrame(
        {
            "key": [pdf["key"].iloc[0]],
            "n_ops": [len(pdf)],
            "n_gets": [len(gets)],
            "linearizable": [_check_one_key(ops)],
            "gets_digest": [digest],
        }
    )


@register(
    "kv_linearizability_contract",
    oracle=_CONTRACT_ORACLE,
    doc="The SQL-checkable projection of the linearizability checker: "
    "over a SEQUENTIAL history (call/ret intervals never overlap, so "
    "call order is the only admissible linearization) the WGL verdict "
    "must coincide with a deterministic prefix-replay — get observes "
    "last-put-before + later-appends-before, exactly models/kv.go:40-69 "
    "specialized to zero concurrency. The history derives from events "
    f"(one op per event, sequential timestamps); gets at seq %% "
    f"{CORRUPT_MOD} == 0 observe a value no write produced ('#' suffix) "
    "and must make exactly their keys non-linearizable. The REAL "
    "checker (the same _check_one_key the concurrent query uses) "
    "produces the Spark-side verdicts; the oracle recomputes verdict + "
    "observed-output digest from first principles in SQL, so a defect "
    "in either the replay or the search surfaces as a hash mismatch. "
    "Concurrent-overlap histories (not SQL-expressible) remain covered "
    "by kv_linearizability + tests/test_linearizability.py.",
    tags=["kv"],
)
def kv_linearizability_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window, functions as F

    from ..sources.tables import table

    ev = table(spark, sf_dir, "events")
    ops = ev.select(
        F.concat(
            F.chr(F.lit(97) + (F.col("user_id") % 50).cast("int") % 26),
            (F.col("user_id") % 50).cast("string"),
        ).alias("key"),
        F.when(F.col("event_type") == "signup", "put")
        .when(F.col("event_type") == "purchase", "get")
        .otherwise("append")
        .alias("op"),
        F.concat(F.lit("v"), (F.col("event_id") % 97).cast("string")).alias("value"),
        F.col("event_id").alias("seq"),
        (F.col("user_id") % 12).alias("client_id"),
    )
    # Observed get outputs: prefix replay per get via one per-key window.
    # This is the FIXTURE constructor — a production harness records
    # observed outputs at call time and never replays (the checker's
    # input is a log, not a computation); the O(prefix) arrays here are
    # test-data synthesis, not the checking dataflow.
    w = (
        Window.partitionBy("key")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixed = ops.withColumn(
        "prefix", F.collect_list(F.struct("seq", "op", "value")).over(w)
    ).withColumn(
        "last_put_seq",
        F.coalesce(
            F.array_max(
                F.transform(
                    F.filter("prefix", lambda x: x.op == F.lit("put")),
                    lambda x: x.seq,
                )
            ),
            F.lit(-1),
        ),
    )
    replayed = prefixed.withColumn(
        "replay",
        F.when(F.col("op") != "get", F.lit("")).otherwise(
            F.concat(
                F.coalesce(
                    F.try_element_at(
                        F.transform(
                            F.filter(
                                "prefix",
                                lambda x: (x.op == F.lit("put"))
                                & (x.seq == F.col("last_put_seq")),
                            ),
                            lambda x: x.value,
                        ),
                        F.lit(1),
                    ),
                    F.lit(""),
                ),
                F.array_join(
                    F.transform(
                        F.filter(
                            "prefix",
                            lambda x: (x.op == F.lit("append"))
                            & (x.seq > F.col("last_put_seq")),
                        ),
                        lambda x: x.value,
                    ),
                    "",
                ),
            )
        ),
    )
    hist = replayed.withColumn(
        "output",
        F.when(
            (F.col("op") == "get") & (F.col("seq") % CORRUPT_MOD == 0),
            F.concat(F.col("replay"), F.lit("#")),
        ).otherwise(F.col("replay")),
    ).select("key", "op", "value", "seq", "client_id", "output")
    return hist.groupBy("key").applyInPandas(
        _contract_verdict,
        schema="key string, n_ops long, n_gets long, linearizable boolean, "
        "gets_digest long",
    )
