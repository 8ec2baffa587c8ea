"""Iterative graph analytics: PageRank over the supplier co-occurrence
graph, with EXACT integer dataflow so every iteration is hash-checkable.

The reference has no graph surface; connected components
(operators/dedup.py) covers contraction-style iteration. This adds the
other canonical iterative shape — fixed-iteration score propagation —
the way a Spark engine actually runs it: the edge list persists once,
each round is one co-partitioned join plus one groupBy(dst) shuffle,
and the per-round constants ride a broadcast 1-row frame (no driver
actions in the loop).

Determinism contract: floating-point PageRank is order-sensitive
(parallel double sums), so ranks are scaled integers (SCALE = 1e12):
init = SCALE // N, contribution = rank // degree, update =
base + (85 * sum) // 100 — all integer ops, bitwise identical in any
execution order and reproduced verbatim by the DuckDB oracle's chained
CTEs. Max intermediate 85 * SCALE ~ 8.5e13, far under 2^63.

Scale notes (billions of edges): the edge frame would be bucketed by
src so the rank join is exchange-free; each iteration's only movement
is the contribution shuffle to dst — the same cost profile as the
GraphX/Pregel aggregateMessages step. Degree-0 nodes cannot occur (the
co-occurrence graph is symmetric); true dangling-mass handling would
add one 1-row aggregate per round, same dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

SCALE = 10**12
PR_ITERS = 3

_CACHE: list[DataFrame] = []


def _evict() -> None:
    while _CACHE:
        try:
            _CACHE.pop().unpersist()
        except Exception:
            pass


def _pagerank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             (SELECT b FROM base) + (85 * sum(r.r // d.degree)) // 100 AS r
      FROM edges e
      JOIN {prev} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )"""
        )
        prev = f"r{i}"
    iters = ",\n    ".join(its)
    return f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    base AS (SELECT (({SCALE} // n_nodes) * 15) // 100 AS b FROM n),
    r0 AS (SELECT src AS node, {SCALE} // n_nodes AS r FROM deg, n),
    {iters}
    SELECT node AS l_suppkey, CAST(r AS BIGINT) AS rank_scaled,
           round(r / {float(SCALE)}, 9) AS rank
    FROM r{PR_ITERS}
    """


@register(
    "supplier_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"{PR_ITERS}-iteration PageRank (d=0.85) over the supplier "
    "co-occurrence graph (suppliers sharing an order are neighbors). "
    "Exact integer arithmetic end-to-end — see module docstring — so "
    "the oracle's chained CTEs reproduce every rank bitwise. Edge list "
    "persists once; each round is one join + one groupBy(dst) shuffle "
    "with broadcast constants, the Pregel aggregateMessages profile.",
    tags=["graph"],
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    _evict()
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = items.select("l_orderkey", F.col("l_suppkey").alias("src"))
    b = items.select("l_orderkey", F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    _CACHE.append(edges)
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    nn = deg.agg(F.count("*").alias("n_nodes"))
    base = nn.select(
        F.expr(f"(({SCALE} div n_nodes) * 15) div 100").alias("b")
    )
    r = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{SCALE} div n_nodes").alias("r"))
    )
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(r, edges["src"] == r["node"])
            .join(deg, "src")
            .select("dst", F.expr("r div degree").alias("c"))
        )
        r = (
            contribs.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(base))
            .select(
                F.col("dst").alias("node"),
                F.expr("b + (85 * s) div 100").alias("r"),
            )
        )
    return r.select(
        F.col("node").alias("l_suppkey"),
        F.col("r").cast("long").alias("rank_scaled"),
        F.round(F.col("r") / F.lit(float(SCALE)), 9).alias("rank"),
    )
