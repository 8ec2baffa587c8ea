"""Porcupine-style linearizability checking — concurrent histories
with overlapping call/return intervals, the last SURVEY §5.3 technique.

Mirrors the reference's validation shape: timed operations recorded
from concurrent clients (kvraft/test_test.go:341-370), checked with a
WGL decision procedure against the string-register KV model
(models/kv.go:17-69). The sequential-model replay in test_kv.py cannot
exercise overlap; these tests do.
"""

import random

import pytest

from mapreduce_framework_in_go_spark import linearizability as lin
from mapreduce_framework_in_go_spark.linearizability import (
    APPEND,
    GET,
    PUT,
    KvOp,
)
from mapreduce_framework_in_go_spark.operators.linearizability import (
    TAMPERED_KEY,
    check_frame,
    history_frame,
)
from mapreduce_framework_in_go_spark.registry import all_queries

SPECS = all_queries()


def test_generated_concurrent_histories_accepted():
    """Linearizable-by-construction histories (explicit linearization
    points inside overlapping intervals) must all pass; tampering one
    observed value must always fail."""
    for seed in range(8):
        h = lin.generate_history(n_clients=8, n_ops=250, n_keys=3, seed=seed)
        # the histories must actually be concurrent — intervals overlap
        overlapping = sum(
            1
            for a in h
            for b in h
            if a is not b and a.call < b.call < a.ret
        )
        assert overlapping > 50, "generator produced a sequential history"
        assert lin.check_history(h)
        assert not lin.check_history(lin.tamper(h, seed))


def test_concurrent_get_may_see_old_or_new():
    """A get overlapping a put may observe either value — both orders
    of linearization points are legal."""
    put = KvOp(0, PUT, "x", "a", "", 0, 10)
    assert lin.check_history([put, KvOp(1, GET, "x", "", "a", 2, 8)])
    assert lin.check_history([put, KvOp(1, GET, "x", "", "", 2, 8)])
    assert not lin.check_history([put, KvOp(1, GET, "x", "", "b", 2, 8)])


def test_real_time_order_enforced():
    """A stale read AFTER a completed put is a violation (this is what
    separates linearizability from serializability)."""
    h = [KvOp(0, PUT, "x", "a", "", 0, 5), KvOp(1, GET, "x", "", "", 6, 9)]
    assert not lin.check_history(h)


def test_append_interleavings():
    """Concurrent appends may land in either order, but the order is a
    single global fact — two gets cannot each observe a different one."""
    a = KvOp(0, APPEND, "x", "A", "", 0, 10)
    b = KvOp(1, APPEND, "x", "B", "", 1, 9)
    assert lin.check_history([a, b, KvOp(2, GET, "x", "", "AB", 12, 14)])
    assert lin.check_history([a, b, KvOp(2, GET, "x", "", "BA", 12, 14)])
    assert not lin.check_history(
        [
            a,
            b,
            KvOp(2, GET, "x", "", "AB", 12, 14),
            KvOp(3, GET, "x", "", "BA", 15, 17),
        ]
    )


def test_sequential_histories_match_direct_replay():
    """On non-overlapping histories the checker must agree with a plain
    sequential replay of the register model (the bridge to
    test_kv.py's sequential model checking)."""
    rng = random.Random(42)
    for _ in range(20):
        t, state, ops = 0, "", []
        for i in range(30):
            kind = rng.choice([GET, PUT, APPEND])
            val = "" if kind == GET else f"v{i},"
            out = state if kind == GET else ""
            ops.append(KvOp(0, kind, "k", val, out, t, t + 1))
            t += 2
            if kind == PUT:
                state = val
            elif kind == APPEND:
                state += val
        assert lin.check_history(ops)
        assert not lin.check_history(lin.tamper(ops, 1))


def test_malformed_operation_rejected():
    with pytest.raises(ValueError):
        lin.check_history([KvOp(0, GET, "x", "", "", 5, 3)])


def test_spark_grouped_map_verdicts(spark):
    """The distributed form: per-key verdicts via applyInPandas must
    agree with the pure-Python checker per partition."""
    h = lin.generate_history(n_clients=6, n_ops=200, n_keys=4, seed=11)
    rows = check_frame(history_frame(spark, h)).collect()
    assert len(rows) == 4
    assert all(r.linearizable for r in rows)
    assert sum(r.n_ops for r in rows) == 200


def test_registered_query_flags_planted_violation(spark, sf_dir):
    verdicts = {
        r.key: r.linearizable
        for r in SPECS["kv_linearizability"].fn(spark, sf_dir).collect()
    }
    assert verdicts[TAMPERED_KEY] is False
    assert all(ok for k, ok in verdicts.items() if k != TAMPERED_KEY)
    assert len(verdicts) >= 4


def test_contract_twin_flags_exactly_corrupted_keys(spark, sf_dir, duck):
    """The SQL-checkable twin: non-linearizable keys must be EXACTLY the
    keys containing a corrupted get (seq % CORRUPT_MOD == 0), and at
    least one of each verdict must occur (the fixture is non-trivial)."""
    from mapreduce_framework_in_go_spark.operators.linearizability import (
        CORRUPT_MOD,
    )

    verdicts = {
        r.key: r.linearizable
        for r in SPECS["kv_linearizability_contract"].fn(spark, sf_dir).collect()
    }
    corrupted = {
        r[0]
        for r in duck.execute(
            f"""
            SELECT DISTINCT chr(97 + CAST(user_id % 50 AS INTEGER) % 26)
                     || CAST(user_id % 50 AS VARCHAR)
            FROM events
            WHERE event_type = 'purchase' AND event_id % {CORRUPT_MOD} = 0
            """
        ).fetchall()
    }
    assert corrupted, "fixture must plant at least one violation"
    assert {k for k, ok in verdicts.items() if not ok} == corrupted
    assert any(ok for ok in verdicts.values())
