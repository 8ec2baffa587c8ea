"""The declared KV/state tier (reference spec, SURVEY.md §2.5) as batch
dataflow.

The reference *declares* (skeleton + complete tests) a linearizable KV
store: a single logical ``map[string]string`` where ``Append`` is string
concatenation (``models/kv.go:40-54``), missing keys read as ``""``
(``kvraft/client.go:29-31``), duplicate client retries must be applied
exactly once (``kvraft/test_test.go:80-97``), keys hash to 10 shards by
first byte (``shardkv/client.go:22-29``), and a shard master rebalances
shards across replica groups with invariants "every shard on a live
group" and "max-min ≤ 1" with minimal movement
(``shardmaster/test_test.go:25-52``).

In Spark the whole tier collapses to an *ordered fold of an ops log into
a keyed state table* (SURVEY.md §3.3): linearizability-per-key is
exactly "fold each key's ops in seq order, each op once". The batch
form lives here; the incremental/streaming form (arbitrary stateful
processing with the same dedup + ordering) is
``streaming/kv_state.py``.

The ops log is derived deterministically from the ``events`` table so
the DuckDB oracle can check the fold end-to-end, including injected
duplicate deliveries (every 7th op is emitted twice with the same op_id
— the "client retry" the reference tests force with unreliable nets).

Scale notes (100 TB): the fold is one shuffle on ``key`` + one on
``op_id`` for dedup; per-key state is built by sorted-struct
aggregation, never a driver loop. A hot key (celebrity append stream)
would salt the dedup stage; the per-key concat is inherently sequential
(that's the semantics), so per-key output size — not row count — is the
binding constraint, same as the reference's 500 B snapshot bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

# ---------------------------------------------------------------------------
# Ops-log derivation (deterministic, shared by engine and oracle)
# ---------------------------------------------------------------------------

# key: first char varies over a-z so key2shard has a real distribution;
# op: signup→put, purchase→get, rest→append; every 7th op duplicated.
_OPS_SQL = """
  SELECT * FROM (
    SELECT chr(97 + CAST(user_id % 50 AS INTEGER) % 26)
             || CAST(user_id % 50 AS VARCHAR)                    AS key,
           CASE WHEN event_type = 'signup'   THEN 'put'
                WHEN event_type = 'purchase' THEN 'get'
                ELSE 'append' END                                AS op,
           'v' || CAST(event_id % 97 AS VARCHAR)                 AS value,
           event_id                                              AS seq,
           'op' || CAST(event_id AS VARCHAR)                     AS op_id
    FROM events
    UNION ALL
    SELECT chr(97 + CAST(user_id % 50 AS INTEGER) % 26)
             || CAST(user_id % 50 AS VARCHAR),
           CASE WHEN event_type = 'signup'   THEN 'put'
                WHEN event_type = 'purchase' THEN 'get'
                ELSE 'append' END,
           'v' || CAST(event_id % 97 AS VARCHAR),
           event_id,
           'op' || CAST(event_id AS VARCHAR)
    FROM events WHERE event_id % 7 = 0
  )
"""


def kv_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KV ops log: (key, op, value, seq, op_id), with ~1/7 duplicate
    deliveries (same op_id) to exercise exactly-once application."""
    return ops_from_events(table(spark, sf_dir, "events"))


def ops_from_events(ev: DataFrame) -> DataFrame:
    """Derive the ops log from an events frame — pure column work, so
    the SAME derivation runs on a batch read or a stream."""
    base = ev.select(
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
        F.concat(F.lit("op"), F.col("event_id").cast("string")).alias("op_id"),
    )
    dupes = base.where(F.col("seq") % 7 == 0)
    return base.unionAll(dupes)


def _sorted_concat(seq: Column, value: Column) -> Column:
    """Order-safe string_agg: collect (seq, value) structs, sort by seq,
    join — deterministic under any shuffle/retry order, the same trick
    every reference Reduce uses (mrapps/crash.go:48-51)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(seq.alias("s"), value.alias("v")))),
            lambda s: s.v,
        ),
        "",
    )


def _sorted_concat_filtered(seq: Column, value: Column, keep: Column) -> Column:
    """_sorted_concat over only the rows matching ``keep`` (conditional
    aggregate — lets one groupBy compute base and appends together)."""
    return F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(keep, F.struct(seq.alias("s"), value.alias("v")))
                )
            ),
            lambda s: s.v,
        ),
        "",
    )


def kv_state(ops: DataFrame) -> DataFrame:
    """Fold an ops log into the final state table.

    Semantics per ``models/kv.go:40-54``: state starts ``""``; ``put``
    overwrites; ``append`` concatenates; ``get`` reads (no state effect);
    duplicate op_ids apply once. Fold = value of the last put (or ``""``)
    followed by all later appends in seq order.

    Plan shape: op-dedup distinct → one per-key window (last put seq) →
    one per-key aggregate. The window's hash partitioning on ``key`` is
    reused by the groupBy, so the whole fold is ~2 exchanges regardless
    of input size (the earlier self-join formulation planned 8).
    """
    effects = (
        ops.where(F.col("op") != "get")
        .select("key", "op", "value", "seq", "op_id")
        .distinct()  # exactly-once: duplicate deliveries are identical rows
    )
    w = Window.partitionBy("key")
    with_base = effects.withColumn(
        "last_put_seq",
        F.coalesce(
            F.max(F.when(F.col("op") == "put", F.col("seq"))).over(w), F.lit(-1)
        ),
    )
    return with_base.groupBy("key").agg(
        F.concat(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("op") == "put")
                        & (F.col("seq") == F.col("last_put_seq")),
                        F.col("value"),
                    )
                ),
                F.lit(""),
            ),
            _sorted_concat_filtered(
                F.col("seq"),
                F.col("value"),
                (F.col("op") == "append") & (F.col("seq") > F.col("last_put_seq")),
            ),
        ).alias("value"),
        F.count("*").alias("n_effect_ops"),
    )


# fold CTEs over an existing ``ops`` relation — shared by the full fold,
# the get query, and the point-in-time snapshot (which redefines ops as
# a seq-bounded prefix)
_FOLD_CTES = """
    effects AS (
      SELECT DISTINCT key, op, value, seq, op_id FROM ops WHERE op <> 'get'
    ),
    last_put AS (
      SELECT key, max(seq) AS last_put_seq FROM effects WHERE op = 'put' GROUP BY key
    ),
    with_base AS (
      SELECT e.*, coalesce(p.last_put_seq, -1) AS last_put_seq
      FROM effects e LEFT JOIN last_put p USING (key)
    ),
    put_val AS (
      SELECT key, value AS base_value FROM with_base
      WHERE op = 'put' AND seq = last_put_seq
    ),
    appended AS (
      SELECT key, string_agg(value, '' ORDER BY seq) AS appended
      FROM with_base WHERE op = 'append' AND seq > last_put_seq GROUP BY key
    ),
    state AS (
      SELECT k.key,
             coalesce(p.base_value, '') || coalesce(a.appended, '') AS value
      FROM (SELECT DISTINCT key FROM effects) k
      LEFT JOIN put_val p USING (key)
      LEFT JOIN appended a USING (key)
    )
"""

_STATE_CTES = f"""
    ops AS ({_OPS_SQL}),
    {_FOLD_CTES}
"""

_STATE_SQL = f"""
    WITH {_STATE_CTES},
    n_ops AS (SELECT key, CAST(count(*) AS BIGINT) AS n_effect_ops
              FROM effects GROUP BY key)
    SELECT s.key, s.value, n.n_effect_ops
    FROM state s LEFT JOIN n_ops n USING (key)
"""


@register(
    "kv_state_fold",
    oracle=_STATE_SQL,
    doc="Ordered fold of the KV ops log into the final state table: "
    "last-put base + later appends in seq order, duplicate op_ids "
    "applied once (models/kv.go:40-54 semantics, "
    "kvraft/test_test.go:80-97 exactly-once invariant).",
    tags=["kv"],
)
def kv_state_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_state(kv_ops(spark, sf_dir))


@register(
    "kv_get",
    oracle=f"""
    WITH {_STATE_CTES},
    gets AS (SELECT DISTINCT key, seq, op_id FROM ops WHERE op = 'get')
    SELECT g.op_id, g.key, coalesce(s.value, '') AS value
    FROM gets g LEFT JOIN state s USING (key)
    """,
    doc="Get(key) over the folded state: linearizable point reads become "
    "a broadcast-able join of the get ops against the state table; "
    "missing keys read as '' (kvraft/client.go:29-31).",
    tags=["kv"],
)
def kv_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = kv_ops(spark, sf_dir)
    state = kv_state(ops).select("key", "value")
    gets = ops.where(F.col("op") == "get").select("op_id", "key", "seq").distinct()
    return (
        gets.join(state, "key", "left")
        .select("op_id", "key", F.coalesce("value", F.lit("")).alias("value"))
    )


@register(
    "kv_snapshot_at",
    oracle=f"""
    WITH all_ops AS ({_OPS_SQL}),
    half AS (SELECT max(seq) // 2 AS s_half FROM all_ops),
    ops AS (SELECT o.* FROM all_ops o, half WHERE o.seq <= s_half),
    {_FOLD_CTES},
    n_ops AS (SELECT key, CAST(count(*) AS BIGINT) AS n_effect_ops
              FROM effects GROUP BY key)
    SELECT s.key, s.value, n.n_effect_ops
    FROM state s LEFT JOIN n_ops n USING (key)
    """,
    doc="Point-in-time state reconstruction (event-sourcing time "
    "travel): the fold replayed over only the ops-log prefix seq <= "
    "max(seq)/2 — what the store contained halfway through history. "
    "The snapshot bound is a broadcast 1-row aggregate (no driver "
    "action); the fold dataflow is kv_state unchanged, which is the "
    "point: ANY seq bound reconstructs any historical state from the "
    "same log, the replay capability the reference's snapshot/restore "
    "tests (kvraft 3B) get from Raft log replay.",
    tags=["kv"],
)
def kv_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = kv_ops(spark, sf_dir)
    s_half = ops.agg(F.expr("max(seq) div 2").alias("s_half"))
    snap = (
        ops.crossJoin(F.broadcast(s_half))
        .where(F.col("seq") <= F.col("s_half"))
        .drop("s_half")
    )
    return kv_state(snap)


# ---------------------------------------------------------------------------
# Sharding: key2shard + distribution
# ---------------------------------------------------------------------------


def key2shard(key: Column, nshards: int = 10) -> Column:
    """``shard = int(key[0]) % NShards`` — first byte of the key
    (shardkv/client.go:22-29; NShards=10, shardmaster/common.go:21)."""
    return F.ascii(F.substring(key, 1, 1)) % nshards


@register(
    "kv_shard_distribution",
    oracle=f"""
    WITH ops AS ({_OPS_SQL})
    SELECT CAST(ascii(substr(key, 1, 1)) % 10 AS INTEGER) AS shard,
           CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_ops
    FROM ops
    GROUP BY 1
    """,
    doc="key2shard routing distribution: shard = first-byte % 10 "
    "(shardkv/client.go:22-29) over the ops log.",
    tags=["kv"],
)
def kv_shard_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = kv_ops(spark, sf_dir)
    return (
        ops.select(key2shard(F.col("key")).alias("shard"), "key")
        .groupBy("shard")
        .agg(
            F.countDistinct("key").alias("n_keys"),
            F.count("*").alias("n_ops"),
        )
    )


# ---------------------------------------------------------------------------
# Shard master: deterministic config rebalance (pure function)
# ---------------------------------------------------------------------------

NSHARDS = 10


@dataclass
class Config:
    """A numbered routing table: shard → replica-group id
    (shardmaster/common.go:25-29; gid 0 = unassigned)."""

    num: int
    shards: list[int] = field(default_factory=lambda: [0] * NSHARDS)
    groups: dict[int, list[str]] = field(default_factory=dict)


def _rebalance(shards: list[int], gids: list[int]) -> list[int]:
    """Move the minimum number of shards so every shard is on a live
    group and group loads differ by at most one
    (shardmaster/test_test.go:25-52). Deterministic: ties break by gid
    order, shards move lowest-index first."""
    if not gids:
        return [0] * len(shards)
    gids = sorted(gids)
    n, g = len(shards), len(gids)
    base, extra = divmod(n, g)
    # target load per gid: first `extra` gids (by sorted order) get base+1
    target = {gid: base + (1 if i < extra else 0) for i, gid in enumerate(gids)}
    load: dict[int, int] = {gid: 0 for gid in gids}
    out = list(shards)
    # keep shards already on live groups up to the target load
    for i, gid in enumerate(out):
        if gid in load and load[gid] < target[gid]:
            load[gid] += 1
        else:
            out[i] = 0  # needs reassignment
    donors = iter(
        [gid for gid in gids for _ in range(target[gid] - load[gid])]
    )
    for i, gid in enumerate(out):
        if gid == 0:
            out[i] = next(donors)
    return out


def apply_ops(ops: list[tuple]) -> list[Config]:
    """Fold Join/Leave/Move ops into the numbered config sequence
    (shardmaster/common.go:37-73 API)."""
    configs = [Config(num=0)]
    for op in ops:
        prev = configs[-1]
        groups = {g: list(s) for g, s in prev.groups.items()}
        shards = list(prev.shards)
        kind = op[0]
        if kind == "join":
            _, gid, servers = op
            groups[gid] = list(servers)
            shards = _rebalance(shards, list(groups))
        elif kind == "leave":
            _, gids = op
            for gid in gids:
                groups.pop(gid, None)
            shards = _rebalance(shards, list(groups))
        elif kind == "move":
            _, shard, gid = op
            shards[shard] = gid
        else:
            raise ValueError(f"unknown op {kind}")
        configs.append(Config(num=prev.num + 1, shards=shards, groups=groups))
    return configs


# The registered scenario: a fixed Join/Leave/Move history. The oracle is
# the (deterministic) expected assignment, pinned as VALUES; the
# invariants themselves are asserted independently in tests/test_kv.py.
_SCENARIO: list[tuple] = [
    ("join", 1, ["s1a", "s1b"]),
    ("join", 2, ["s2a", "s2b"]),
    ("join", 3, ["s3a"]),
    ("leave", [1]),
    ("move", 0, 3),
    ("join", 4, ["s4a"]),
    ("leave", [2, 3]),
]


def _scenario_rows() -> list[tuple[int, int, int]]:
    return [
        (cfg.num, shard, gid)
        for cfg in apply_ops(_SCENARIO)
        for shard, gid in enumerate(cfg.shards)
    ]


def _values_sql(rows: list[tuple], col_names: list[str]) -> str:
    """Pin a small control-plane result as a DuckDB VALUES oracle."""
    values = ", ".join("(" + ", ".join(str(v) for v in row) + ")" for row in rows)
    cols = ", ".join(
        f"CAST(col{i} AS INTEGER) AS {name}" for i, name in enumerate(col_names)
    )
    srcs = ", ".join(f"col{i}" for i in range(len(col_names)))
    return f"SELECT {cols} FROM (VALUES {values}) t({srcs})"


def _scenario_values_sql() -> str:
    return _values_sql(_scenario_rows(), ["config_num", "shard", "gid"])


@register(
    "shard_rebalance_scenario",
    oracle=_scenario_values_sql(),
    doc="Shard-master config history for a fixed Join/Leave/Move scenario "
    "(shardmaster/common.go:37-73): deterministic minimal-movement "
    "rebalance, max-min ≤ 1, every shard on a live group. The control "
    "plane is a pure function (it is ~KB-sized at any scale); the data "
    "plane consumes it as a broadcast dimension.",
    tags=["kv"],
)
def shard_rebalance_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        _scenario_rows(), schema="config_num int, shard int, gid int"
    )


def migration_plan(configs: list[Config]) -> list[tuple[int, int, int, int]]:
    """Shard movements between consecutive configs:
    (to_config_num, shard, from_gid, to_gid). This is the data-movement
    schedule the sharded store executes on reconfiguration
    (shardkv/server.go's declared migration duty); gid 0 = unassigned,
    so rows with from_gid=0 are initial placements, not copies."""
    moves = []
    for prev, cfg in zip(configs, configs[1:]):
        for shard in range(NSHARDS):
            if prev.shards[shard] != cfg.shards[shard]:
                moves.append((cfg.num, shard, prev.shards[shard], cfg.shards[shard]))
    return moves


def _migration_values_sql() -> str:
    return _values_sql(
        migration_plan(apply_ops(_SCENARIO)),
        ["to_config_num", "shard", "from_gid", "to_gid"],
    )


@register(
    "shard_migration_plan",
    oracle=_migration_values_sql(),
    doc="Shard migration schedule between consecutive configs of the "
    "fixed Join/Leave/Move scenario: which shard moves from which "
    "group to which, per reconfiguration — the declared data-movement "
    "duty of the sharded store (shardkv client/server protocol). "
    "Control-plane-sized; consumed as a broadcast dimension by any "
    "data-plane move.",
    tags=["kv"],
)
def shard_migration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        migration_plan(apply_ops(_SCENARIO)),
        schema="to_config_num int, shard int, from_gid int, to_gid int",
    )
