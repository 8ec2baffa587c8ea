"""Engine-vs-oracle comparison, mirroring the driver's check:
row count + column names + order-insensitive values (columns sorted by
name, rows sorted canonically). Floats are compared exactly — queries
are required to round on both sides.
"""

from __future__ import annotations

import math


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and represent consistently
        if v == 0.0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rows_canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in columns), out


def compare(spark_df, duck_con, oracle_sql: str):
    """Assert engine DataFrame == DuckDB oracle result."""
    engine_cols = spark_df.columns
    engine_rows = [tuple(r) for r in spark_df.collect()]

    res = duck_con.execute(oracle_sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    ec, er = rows_canonical(engine_cols, engine_rows)
    oc, orr = rows_canonical(oracle_cols, oracle_rows)

    assert ec == oc, f"column mismatch: engine={ec} oracle={oc}"
    assert len(er) == len(orr), f"row count: engine={len(er)} oracle={len(orr)}"
    if er != orr:
        diffs = [(a, b) for a, b in zip(er, orr) if a != b][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
