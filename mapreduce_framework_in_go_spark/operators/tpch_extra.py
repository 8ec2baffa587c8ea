"""Extended TPC-H coverage (Q4, Q7, Q8, Q9, Q13, Q14, Q15, Q17, Q19,
Q21, Q22), adapted to the synthetic schema where columns are missing:
no ``partsupp`` table (Q9's supplycost term dropped), no
``l_commitdate``/``l_receiptdate`` ("late" is re-expressed as
``l_shipdate > o_orderdate + N days``), no ``c_phone`` (Q22 selects by
nation key set), no ``p_container``/``l_shipmode`` (filters swap to
``p_brand``/``p_size``). The partsupp-centric Q2/Q11/Q16/Q20 live in
tpch_partsupp.py over a deterministic derived partsupp table.

Money aggregation follows the module convention in relational.py:
exact fixed-point (sum of scaled BIGINT cents) on both engine and
oracle, so parallel summation order can never flip a hash. Ratio
outputs (market share, promo share) divide exact integers and round 6.

Scale notes (100 TB): every query keeps dimension joins broadcast
(region/nation/supplier/part at TPC-H proportions are MB-scale beside
lineitem), pushes its date/brand/size predicates into the parquet scan,
and aggregates with map-side partials. The EXISTS/NOT-EXISTS shapes
(Q4/Q21/Q22) are expressed as left-semi / left-anti joins — Spark's
native physical forms — never as collected ID lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import _t, favg, fixed_point, fsum

_REV_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"
_REV_OUT = f"CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking), lateness adapted to "
    "l_shipdate > o_orderdate + 60d (no l_commitdate/l_receiptdate in "
    "schema). EXISTS as a left-semi join on orderkey with the "
    "inequality as join condition; date filter pushed to the orders "
    "scan.",
    tags=["tpch"],
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) / 10000.0 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             {_REV_SQL} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping between two nations by year). "
    "nation joins broadcast; the two-nation predicate prunes before "
    "the big orders join.",
    tags=["tpch"],
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(fsum(_rev(), 10000).alias("revenue"))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 * 1.0 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 (national market share): fraction of ASIA-region "
    "PROMO-part revenue supplied by NATION_5, by order year. Share is "
    "a ratio of exact fixed-point sums, rounded 6. part/nation/region "
    "broadcast; p_type filter pushed to the part scan.",
    tags=["tpch"],
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    volume = fixed_point(_rev(), 10000)
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(F.broadcast(n2), F.col("s_nk") == F.col("s_nationkey"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0)))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, {_REV_OUT} AS profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice, l.l_discount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 (product type profit) without the ps_supplycost term "
    "(no partsupp table): profit = discounted revenue on '%widget%' "
    "parts by supplier nation and order year. part/supplier/nation "
    "broadcast against lineitem; LIKE filter pushed down.",
    tags=["tpch"],
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(fsum(_rev(), 10000).alias("profit"))


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 (customer order-count distribution), the comment "
    "filter adapted to o_orderpriority. Outer join preserved so "
    "zero-order customers land in the c_count=0 bucket; two-level "
    "aggregation with map-side partials.",
    tags=["tpch"],
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(
        SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) * 100.0
        / SUM({_REV_SQL}), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 (promotion effect): percent of one month's revenue "
    "from PROMO parts. Ratio of exact fixed-point sums; part join "
    "broadcast, date range pushed to the lineitem scan.",
    tags=["tpch"],
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    vol = fixed_point(_rev(), 10000)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(vol.alias("v"), F.col("p_type"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", F.col("v")).otherwise(F.lit(0)))
                * 100.0
                / F.sum("v"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV_OUT} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier, "
    "return the max-revenue supplier(s). The scalar max and the "
    "equality test are over exact fixed-point revenue, so the "
    "tie-comparison is safe; the max is a broadcast scalar, not a "
    "driver collect.",
    tags=["tpch"],
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fsum(_rev(), 10000).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH target AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size < 10
    ),
    stats AS (
      SELECT l_partkey,
             SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem JOIN target ON p_partkey = l_partkey
      GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN stats s ON s.l_partkey = l.l_partkey
    WHERE 2 * CAST(round(l.l_quantity * 100) AS BIGINT) * s.cnt < s.qty_cents
    """,
    doc="TPC-H Q17 (small-quantity-order revenue), container filter "
    "adapted to p_brand+p_size. The correlated avg-quantity subquery "
    "becomes a per-part aggregate joined back; the quantity < 0.5*avg "
    "predicate is rearranged to exact integer arithmetic "
    "(2*qty*count < sum) so engine and oracle decide identically.",
    tags=["tpch"],
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    li = _t(spark, sf_dir, "lineitem")
    target_li = li.join(
        F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey")
    )
    stats = target_li.groupBy(F.col("l_partkey").alias("sk")).agg(
        F.sum(fixed_point(F.col("l_quantity"), 100)).alias("qty_cents"),
        F.count("*").alias("cnt"),
    )
    return (
        target_li.join(F.broadcast(stats), F.col("sk") == F.col("l_partkey"))
        .where(
            2 * fixed_point(F.col("l_quantity"), 100) * F.col("cnt")
            < F.col("qty_cents")
        )
        .agg(
            (fsum(F.col("l_extendedprice"), 100) / 7.0).alias("avg_yearly")
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {_REV_OUT} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue, OR-of-ANDs): three "
    "brand/size/quantity branches (shipmode/shipinstruct not in "
    "schema). The disjunction sits on a broadcast hash join of part — "
    "Catalyst turns the common p_partkey = l_partkey into the join key "
    "and evaluates the residual OR as a filter.",
    tags=["tpch"],
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(branch).agg(fsum(_rev(), 10000).alias("revenue"))


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(count(DISTINCT lt.l_orderkey) AS BIGINT) AS numwait
    FROM late lt
    JOIN supplier s ON s.s_suppkey = lt.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = lt.l_orderkey AND l2.l_suppkey <> lt.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = lt.l_orderkey AND l3.l_suppkey <> lt.l_suppkey
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting), lateness "
    "adapted to l_shipdate > o_orderdate + 90d: NATION_7 suppliers "
    "who were the ONLY late supplier on a multi-supplier finalized "
    "order. EXISTS/NOT EXISTS become left-semi / left-anti joins on "
    "orderkey with the supplier-inequality as join condition.",
    tags=["tpch"],
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    lt = late.alias("lt")
    others = li.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("lo_ok"), F.col("l_suppkey").alias("lo_sk")
    )
    return (
        lt.join(
            others,
            (F.col("o_ok") == F.col("lt.l_orderkey"))
            & (F.col("o_sk") != F.col("lt.l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("lo_ok") == F.col("lt.l_orderkey"))
            & (F.col("lo_sk") != F.col("lt.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT * FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    threshold AS (
      SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS totacctbal
    FROM pool c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity), phone-prefix selection "
    "adapted to a nation-key set and 'no orders' scoped to the last "
    "dataset years (the synthetic corpus has no order-less customers). "
    "The scalar avg threshold is exact fixed-point and broadcast; the "
    "NOT EXISTS is a left-anti join against date-filtered orders.",
    tags=["tpch"],
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = _t(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    threshold = pool.where(F.col("c_acctbal") > 0.0).agg(
        favg(F.col("c_acctbal"), 100).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return (
        pool.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            fsum(F.col("c_acctbal"), 100).alias("totacctbal"),
        )
    )


@register(
    "q12_shipping_modes",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 (shipping modes and order priority), shipmode "
    "adapted to l_returnflag and lateness to l_shipdate > o_orderdate "
    "+ 60d: per class, late lineitems split into high/low priority "
    "conditional counts. One join (orders side filtered late), one "
    "aggregate.",
    tags=["tpch"],
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
