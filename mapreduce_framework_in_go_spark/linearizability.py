"""Linearizability checking for concurrent KV histories.

The reference validates its KV service by recording timed operations
from concurrent clients and running the porcupine decision procedure
over them. This module provides the same capability for this engine's
KV semantics:

- the decision procedure is the Wing-Gong/Lowe algorithm with a
  (linearized-set, state) memo cache — behavioral parity with
  ``/root/reference/porcupine/checker.go:181-281`` (``checkSingle``);
- the KV model matches ``/root/reference/models/kv.go:17-69``: the
  history partitions by key (a history is linearizable iff every
  per-key subhistory is), per-key state is a string, ``get`` must
  observe the current value exactly, ``put`` replaces, ``append``
  concatenates;
- the recording shape (client id, input op/key/value, call timestamp,
  output value, return timestamp) matches the harness in
  ``/root/reference/kvraft/test_test.go:341-370``.

Unlike a sequential-model replay (tests/test_kv.py), this checker
accepts histories whose call/return intervals OVERLAP: an operation may
take effect at any point between its invocation and its response, and
the checker searches for a total order of linearization points that is
consistent with real time and with the register semantics.

``generate_history`` produces genuinely-concurrent histories that are
linearizable by construction: operations get explicit linearization
points inside their intervals, mutations are replayed in linearization
order to derive each ``get``'s output, and per-client sequentiality is
enforced. Tampering any observed value then yields a history the
checker must reject.

Scale note: histories partition by key, so checking distributes as an
ordinary grouped map — see ``operators/linearizability.py`` for the
``applyInPandas`` form (the model's Partition function IS the Spark
partitioning).
"""

from __future__ import annotations

import random
from collections import defaultdict
from dataclasses import dataclass, replace

GET, PUT, APPEND = 0, 1, 2
OP_NAMES = {GET: "get", PUT: "put", APPEND: "append"}


@dataclass(frozen=True)
class KvOp:
    """One recorded operation: ``input`` is (op, key, value), ``output``
    is the observed value (gets only), ``call``/``ret`` are the
    invocation/response timestamps."""

    client_id: int
    op: int
    key: str
    value: str
    output: str
    call: int
    ret: int


class _Entry:
    __slots__ = ("idx", "is_return", "prev", "next")

    def __init__(self, idx: int, is_return: bool) -> None:
        self.idx = idx
        self.is_return = is_return
        self.prev: _Entry | None = None
        self.next: _Entry | None = None


def _kv_step(state: str, op: KvOp) -> tuple[bool, str]:
    """The string-register step function: may the op take effect in
    ``state``, and what state results."""
    if op.op == GET:
        return op.output == state, state
    if op.op == PUT:
        return True, op.value
    return True, state + op.value


def _check_one_key(ops: list[KvOp]) -> bool:
    """WGL search over one key's subhistory.

    Entries (calls and returns) are kept in a doubly-linked list in
    time order. Repeatedly try to linearize the minimal candidate: scan
    from the front for a CALL whose operation can take effect in the
    current state; committing to it removes its call+return from the
    list and pushes a frame for backtracking. Reaching a RETURN first
    means some already-responded operation cannot be ordered — undo the
    latest commitment. The (linearized-set, state) cache prunes
    re-exploration of equivalent search nodes.
    """
    if not ops:
        return True
    # time-ordered entries; all-distinct timestamps are not required —
    # ties order calls first, which only relaxes (never invents)
    # real-time constraints.
    events: list[tuple[int, int, _Entry]] = []
    for i, o in enumerate(ops):
        if o.ret < o.call:
            raise ValueError(f"operation returns before it is called: {o}")
        events.append((o.call, 0, _Entry(i, False)))
        events.append((o.ret, 1, _Entry(i, True)))
    events.sort(key=lambda t: (t[0], t[1]))

    head = _Entry(-1, False)  # sentinel
    tail = head
    returns: dict[int, _Entry] = {}
    for _, _, e in events:
        tail.next, e.prev, tail = e, tail, e
        if e.is_return:
            returns[e.idx] = e

    def unlink(e: _Entry) -> None:
        e.prev.next = e.next
        if e.next is not None:
            e.next.prev = e.prev

    def relink(e: _Entry) -> None:
        e.prev.next = e
        if e.next is not None:
            e.next.prev = e

    state = ""
    linearized = 0
    seen: set[tuple[int, str]] = {(0, state)}
    stack: list[tuple[_Entry, str]] = []
    entry = head.next
    while head.next is not None:
        if entry is None:
            raise AssertionError("walked past a dangling history")
        if not entry.is_return:
            ok, new_state = _kv_step(state, ops[entry.idx])
            key = (linearized | (1 << entry.idx), new_state)
            if ok and key not in seen:
                seen.add(key)
                stack.append((entry, state))
                state = new_state
                linearized |= 1 << entry.idx
                unlink(returns[entry.idx])
                unlink(entry)
                entry = head.next
            else:
                entry = entry.next
        else:
            if not stack:
                return False
            entry, state = stack.pop()
            linearized &= ~(1 << entry.idx)
            relink(entry)
            relink(returns[entry.idx])
            entry = entry.next
    return True


def partition_by_key(ops: list[KvOp]) -> dict[str, list[KvOp]]:
    by_key: dict[str, list[KvOp]] = defaultdict(list)
    for o in ops:
        by_key[o.key].append(o)
    return dict(by_key)


def check_history(ops: list[KvOp]) -> bool:
    """True iff the concurrent history is linearizable under the KV
    register model. Partitioned per key first (sound because keys are
    independent — the reference model's Partition function)."""
    return all(_check_one_key(sub) for sub in partition_by_key(ops).values())


def generate_history(
    n_clients: int = 8,
    n_ops: int = 200,
    n_keys: int = 4,
    seed: int = 0,
    overlap: int = 6,
) -> list[KvOp]:
    """A concurrent, linearizable-by-construction history.

    Each operation is assigned a linearization point strictly inside
    its [call, ret] interval; intervals from different clients overlap
    (width ~``overlap`` ticks), clients stay sequential. Mutations are
    replayed in linearization order to fill in each get's output.
    """
    rng = random.Random(seed)
    client_free = [0] * n_clients
    pending: list[tuple[int, int, KvOp]] = []  # (lin, order, op-sans-output)
    clock = 0
    for i in range(n_ops):
        cli = min(range(n_clients), key=lambda c: (client_free[c], c))
        clock = max(clock, client_free[cli]) + rng.randrange(1, 3)
        call = clock
        lin = call + rng.randrange(1, overlap)
        ret = lin + rng.randrange(1, overlap)
        client_free[cli] = ret + 1
        kind = rng.choice([GET, PUT, APPEND, APPEND, GET])
        key = f"k{rng.randrange(n_keys)}"
        value = "" if kind == GET else f"x{cli}.{i} "
        pending.append(
            (lin, i, KvOp(cli, kind, key, value, "", call, ret))
        )
    registers: dict[str, str] = defaultdict(str)
    out: list[KvOp] = []
    for _, _, op in sorted(pending):
        if op.op == GET:
            op = replace(op, output=registers[op.key])
        elif op.op == PUT:
            registers[op.key] = op.value
        else:
            registers[op.key] = registers[op.key] + op.value
        out.append(op)
    out.sort(key=lambda o: (o.call, o.ret))
    return out


def corrupt_get(ops: list[KvOp], idx: int) -> list[KvOp]:
    """Corrupt the get at ``idx``: append a marker no write ever
    produces (generated values are ``x<cli>.<i> `` shaped), so the
    resulting history is non-linearizable by construction."""
    bad = replace(ops[idx], output=ops[idx].output + "#corrupt#")
    return [*ops[:idx], bad, *ops[idx + 1 :]]


def tamper(ops: list[KvOp], seed: int = 0) -> list[KvOp]:
    """Corrupt one randomly-chosen get's observed value — the resulting
    history must be rejected."""
    rng = random.Random(seed)
    gets = [i for i, o in enumerate(ops) if o.op == GET]
    if not gets:
        raise ValueError("history has no get to tamper")
    return corrupt_get(ops, rng.choice(gets))
