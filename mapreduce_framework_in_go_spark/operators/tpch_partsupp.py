"""TPC-H Q2 / Q11 / Q16 / Q20 over a DERIVED partsupp relation.

The synthetic schema ships no ``partsupp`` table, so these four
partsupp-centric queries are reconstructed over a deterministic
derivation both engines compute identically:

    partsupp := one row per DISTINCT (l_partkey, l_suppkey) observed in
    lineitem, with
      ps_availqty   = number of lineitems for the pair (integer, exact)
      ps_supplycost = (md5_32(pk || '_' || sk) % 100000) / 100.0
                      (deterministic pseudo-cost, 0.00-999.99)

This preserves each query's OPERATOR shape — Q2's correlated min
subquery, Q11's HAVING-over-scalar-subquery, Q16's distinct-count with
an anti-joined exclusion list, Q20's nested semi-joins against shipped
quantities — which is what the coverage is for.

Scale notes: the derivation is one groupBy of lineitem (shuffle on the
pair key); every downstream dimension join broadcasts; Q2's correlated
subquery becomes a per-part window min (no re-scan); Q11's threshold is
a broadcast scalar. supplycost is exact at 2 decimals so cost sums use
fixed-point at scale 100 * qty (integers) — hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long32
from ..registry import register
from .relational import _t, fixed_point

_PS_SQL = """
  partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           CAST(count(*) AS BIGINT) AS ps_availqty,
           (('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '_'
                                || CAST(l_suppkey AS VARCHAR)), 1, 8))::BIGINT
             % 100000) / 100.0 AS ps_supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
  )
"""


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        md5_long32(
            F.concat(
                F.col("ps_partkey").cast("string"),
                F.lit("_"),
                F.col("ps_suppkey").cast("string"),
            )
        )
        % 100000
    ) / 100.0
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.count("*").alias("ps_availqty"))
        .withColumn("ps_supplycost", cost)
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL},
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    costs AS (
      SELECT p.p_partkey, p.p_name, e.s_name, e.n_name,
             round(e.s_acctbal, 2) AS s_acctbal, ps.ps_supplycost,
             min(ps.ps_supplycost) OVER (PARTITION BY p.p_partkey)
               AS min_cost
      FROM part p
      JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
      JOIN eu e ON e.s_suppkey = ps.ps_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_name, s_name, n_name AS nation, s_acctbal,
           ps_supplycost
    FROM costs WHERE ps_supplycost = min_cost
    """,
    doc="TPC-H Q2 (minimum-cost supplier) over derived partsupp: for "
    "each size-15 STANDARD part, the EUROPE supplier(s) offering the "
    "minimum supplycost. The correlated min subquery is a per-part "
    "window over the already-joined rows (one pass, no re-scan); the "
    "cost equality is exact (2-decimal fixed values).",
    tags=["tpch"],
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = partsupp(spark, sf_dir)
    costs = (
        ps.join(F.broadcast(p.select("p_partkey", "p_name")), F.col("p_partkey") == F.col("ps_partkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("ps_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "ps_supplycost",
        )
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_SQL},
    national AS (
      SELECT ps.ps_partkey,
             CAST(round(ps.ps_supplycost * 100) AS BIGINT) * ps.ps_availqty
               AS value_cents
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    total AS (SELECT SUM(value_cents) AS total_cents FROM national)
    SELECT ps_partkey,
           CAST(SUM(value_cents) AS DOUBLE) / 100.0 AS stock_value
    FROM national, total
    GROUP BY ps_partkey, total_cents
    HAVING SUM(value_cents) > 0.001 * total_cents
    """,
    doc="TPC-H Q11 (important stock) over derived partsupp: parts whose "
    "NATION_3 stock value (supplycost*availqty) exceeds 0.1% of the "
    "national total. The scalar total is a broadcast single-row "
    "aggregate; value arithmetic is integer cents, so the HAVING "
    "threshold compares exactly on both engines.",
    tags=["tpch"],
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    national = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (
                fixed_point(F.col("ps_supplycost"), 100) * F.col("ps_availqty")
            ).alias("value_cents"),
        )
    )
    total = national.agg(F.sum("value_cents").alias("total_cents"))
    return (
        national.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("part_cents"))
        .join(F.broadcast(total))
        .where(F.col("part_cents") > 0.001 * F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("part_cents").cast("double") / 100.0).alias("stock_value"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_PS_SQL},
    excluded AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 5, 9, 15, 25)
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 (supplier-part counts) over derived partsupp: "
    "distinct suppliers per (brand, type, size) for non-PROMO parts in "
    "a size set, excluding negative-balance suppliers (the complaints "
    "filter adapted to available columns) via a left-anti join.",
    tags=["tpch"],
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 9, 15, 25)
    )
    excluded = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(excluded, F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PS_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    qualifying AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE p.p_name LIKE 'red%'
        AND ps.ps_availqty * 100 * 100 > 50 * sh.qty_cents
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT ps_suppkey FROM qualifying)
    """,
    doc="TPC-H Q20 (potential part promotion) over derived partsupp: "
    "suppliers of 'red%' parts whose availqty exceeds half the "
    "quantity they shipped in 1997. The nested EXISTS chain becomes "
    "a join + distinct + left-semi join; the half-of-shipped "
    "comparison is integer-exact (availqty*100*100 > 50*qty_cents).",
    tags=["tpch"],
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(fixed_point(F.col("l_quantity"), 100)).alias("qty_cents")
    )
    qualifying = (
        ps.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") * 100 * 100 > 50 * F.col("qty_cents"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(qualifying, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )
