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


_TRI_ORACLE = """
    WITH items AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey <> b.l_suppkey
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst AND e2.dst > e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
      WHERE e1.src < e1.dst
    ),
    per_node AS (
      SELECT node, count(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    ),
    deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY 1)
    SELECT d.node AS l_suppkey,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(p.t, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN d.degree >= 2
                      THEN coalesce(p.t, 0) * 2.0 / (d.degree * (d.degree - 1))
                      ELSE 0.0 END, 9) AS clustering_coef
    FROM deg d LEFT JOIN per_node p USING (node)
    """


@register(
    "triangle_count",
    oracle=_TRI_ORACLE,
    doc="Per-node triangle count + local clustering coefficient over "
    "the supplier co-occurrence graph, via DEGREE ORIENTATION: each "
    "undirected edge is kept only in the (degree, id)-ascending "
    "direction, so every wedge is enumerated at its lowest-degree "
    "vertex and the oriented out-degree is O(sqrt(m)) — the pair "
    "fan-out that makes distributed triangle counting feasible (the "
    "naive wedge count at a hub is quadratic in its degree; oriented, "
    "the hub is the TARGET of its high-degree neighbors' wedges, "
    "never the pivot). Wedges close via one equi-join back to the "
    "oriented edge list. Each triangle is found exactly once. The "
    "oracle is the independent naive a<b<c three-way self-join.",
    tags=["graph"],
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return triangles_per_node(edges).withColumnRenamed("node", "l_suppkey")


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle counting over a SYMMETRIC distinct edge
    frame (src, dst) — see the triangle_count doc for the cost
    argument. Returns (node, degree, n_triangles, clustering_coef)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("degree")).select(
        F.col("src").alias("node"), "degree"
    )
    # Orient each symmetric edge in the (degree, id)-ascending direction.
    o = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("degree", "ds")
        .join(
            deg.select(F.col("node").alias("dst"), F.col("degree").alias("dd")),
            "dst",
        )
        .where(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "dd")
        .persist()
    )
    _CACHE.append(o)
    # Wedges at the pivot u: oriented out-neighbor pairs (v, w) with v
    # before w in the SAME orientation order, so the closing edge — if
    # the triangle exists — appears in o as exactly (v, w).
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("dd").alias("dv"))
    e2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("dd").alias("dw"))
    wedges = e1.join(e2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tri = wedges.join(
        o.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "leftsemi",
    ).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    F.coalesce("t", F.lit(0))
                    * 2.0
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(0.0),
                9,
            ).alias("clustering_coef"),
        )
    )
