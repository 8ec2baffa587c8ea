"""KV tier tests: fold semantics, exactly-once, shard invariants —
the reference's kvraft/shardmaster test strategies (SURVEY.md §5.2/§5.4)
re-expressed for dataflow."""

import random

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import kv

from .oracle import rows_canonical


def test_kv_append_semantics_small(spark):
    """Hand-checkable fold: put overwrites, append concatenates, get is
    a no-op, duplicates apply once (models/kv.go:40-54)."""
    ops = spark.createDataFrame(
        [
            ("a", "append", "x", 1, "op1"),
            ("a", "put", "BASE", 2, "op2"),
            ("a", "append", "y", 3, "op3"),
            ("a", "append", "y", 3, "op3"),  # duplicate delivery
            ("a", "append", "z", 4, "op4"),
            ("b", "append", "q", 5, "op5"),  # append with no prior put
            ("c", "get", "", 6, "op6"),  # get only — no state
        ],
        schema="key string, op string, value string, seq long, op_id string",
    )
    state = {r["key"]: (r["value"], r["n_effect_ops"]) for r in kv.kv_state(ops).collect()}
    assert state == {"a": ("BASEyz", 4), "b": ("q", 1)}


def test_kv_fold_linearizable_model(spark):
    """Porcupine-style model check (models/kv.go technique): replay the
    ops log sequentially in pure Python — the linearization the seq
    order defines — and require the distributed fold to match exactly."""
    random.seed(42)
    rows = []
    seq = 0
    for _ in range(500):
        key = f"k{random.randint(0, 9)}"
        op = random.choice(["put", "append", "append", "get"])
        val = f"v{random.randint(0, 99)}," if op != "get" else ""
        seq += 1
        rows.append((key, op, val, seq, f"op{seq}"))
        if seq % 5 == 0:
            rows.append((key, op, val, seq, f"op{seq}"))  # retry

    # sequential oracle (the model): apply each op once, in seq order
    model: dict[str, str] = {}
    counts: dict[str, int] = {}
    seen = set()
    for key, op, val, s, op_id in rows:
        if op_id in seen or op == "get":
            continue
        seen.add(op_id)
        model[key] = val if op == "put" else model.get(key, "") + val
        counts[key] = counts.get(key, 0) + 1

    ops = spark.createDataFrame(
        rows, schema="key string, op string, value string, seq long, op_id string"
    )
    got = {r["key"]: (r["value"], r["n_effect_ops"]) for r in kv.kv_state(ops).collect()}
    assert got == {k: (model[k], counts[k]) for k in model}


def test_rebalance_invariants():
    """shardmaster/test_test.go:25-52 invariants over random histories:
    every shard on a live group, max-min ≤ 1, and minimal movement on
    each Join/Leave."""
    random.seed(7)
    for _ in range(50):
        ops = []
        live = set()
        gid = 0
        for _ in range(random.randint(1, 12)):
            if not live or random.random() < 0.6:
                gid += 1
                ops.append(("join", gid, [f"s{gid}"]))
                live.add(gid)
            else:
                leaver = random.choice(sorted(live))
                ops.append(("leave", [leaver]))
                live.discard(leaver)
        configs = kv.apply_ops(ops)
        for prev, cfg in zip(configs, configs[1:]):
            gids = set(cfg.groups)
            if not gids:
                assert all(g == 0 for g in cfg.shards)
                continue
            assert all(g in gids for g in cfg.shards), (cfg.num, cfg.shards, gids)
            loads = [cfg.shards.count(g) for g in gids]
            assert max(loads) - min(loads) <= 1, (cfg.num, cfg.shards)
            # minimal movement: shards that could legally stay, stayed
            if set(prev.groups) and prev.num + 1 == cfg.num:
                moved = sum(
                    1
                    for s in range(kv.NSHARDS)
                    if prev.shards[s] != cfg.shards[s] and prev.shards[s] in gids
                )
                n, g = kv.NSHARDS, len(gids)
                base, extra = divmod(n, g)
                # an upper bound on necessary moves: rows above target
                max_needed = sum(
                    max(0, prev.shards.count(gid) - (base + 1)) for gid in gids
                ) + sum(1 for s in range(n) if prev.shards[s] not in gids)
                assert moved <= max(max_needed, n)  # sanity: no wholesale reshuffle


def test_key2shard_matches_reference_formula(spark):
    """shard = int(key[0]) % 10 (shardkv/client.go:22-29)."""
    df = spark.createDataFrame([("a0",), ("z9",), ("k42",)], schema="key string")
    got = {
        r["key"]: r["shard"]
        for r in df.select("key", kv.key2shard(F.col("key")).alias("shard")).collect()
    }
    assert got == {"a0": ord("a") % 10, "z9": ord("z") % 10, "k42": ord("k") % 10}


def test_kv_state_rerun_deterministic(spark, sf_dir):
    q = kv.kv_state_fold

    def run():
        d = q(spark, sf_dir)
        return rows_canonical(d.columns, [tuple(r) for r in d.collect()])

    assert run() == run()


def test_kv_fold_hypothesis_model_check(spark):
    """Property-based form of the porcupine model check (SURVEY §5.3):
    for arbitrary op logs — including duplicate op_ids and interleaved
    keys — the distributed fold equals the sequential model replay."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ops_strategy = st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.sampled_from(["put", "append", "get"]),
            st.text(alphabet="abcXYZ,;", min_size=0, max_size=4),
            st.booleans(),  # duplicate this op?
        ),
        min_size=1,
        max_size=25,
    )

    @given(ops_strategy)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(raw):
        rows = []
        for seq, (key, op, val, dup) in enumerate(raw, start=1):
            rows.append((key, op, val, seq, f"op{seq}"))
            if dup:
                rows.append((key, op, val, seq, f"op{seq}"))
        model: dict[str, str] = {}
        counts: dict[str, int] = {}
        seen = set()
        for key, op, val, s, op_id in rows:
            if op_id in seen or op == "get":
                continue
            seen.add(op_id)
            model[key] = val if op == "put" else model.get(key, "") + val
            counts[key] = counts.get(key, 0) + 1
        ops = spark.createDataFrame(
            rows, schema="key string, op string, value string, seq long, op_id string"
        )
        got = {
            r["key"]: (r["value"], r["n_effect_ops"])
            for r in kv.kv_state(ops).collect()
        }
        assert got == {k: (model[k], counts[k]) for k in model}

    check()


def test_migration_plan_consistency():
    """Migration rows must exactly reconstruct each config from its
    predecessor, and never move a shard to a dead group."""
    configs = kv.apply_ops(
        [("join", 1, ["a"]), ("join", 2, ["b"]), ("leave", [1]), ("join", 3, ["c"])]
    )
    moves = kv.migration_plan(configs)
    shards = list(configs[0].shards)
    by_config = {}
    for n, s, f, t in moves:
        by_config.setdefault(n, []).append((s, f, t))
    for cfg in configs[1:]:
        for s, f, t in by_config.get(cfg.num, []):
            assert shards[s] == f
            shards[s] = t
            assert t == 0 or t in cfg.groups
        assert shards == cfg.shards, cfg.num
