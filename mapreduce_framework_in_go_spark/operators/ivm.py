"""Incremental view maintenance: maintain a 100 TB aggregate by merging
a delta batch's PARTIAL STATE into the stored state — never by
recomputing the corpus.

The contract that makes this possible is algebraic mergeability:
``state(base) ⊕ state(delta) == state(base ∪ delta)`` when every
maintained measure is a semigroup fold (count/sum/min/max — and any
derived measure like avg is computed at READ time from (sum, count),
never stored, because avg itself does not merge). That is exactly the
map-side-combine algebra Spark's own partial aggregation uses inside
one job; IVM lifts it across jobs/days.

Both queries here SIMULATE the base/delta split deterministically from
one table (orderkey ending in 0 = today's delta) so the driver's oracle
— a flat full-table recompute — checks the merged state bitwise. At
scale the base state is a stored table of O(groups) rows; maintaining
it costs one scan of the DELTA plus an O(groups) merge shuffle,
independent of base corpus size.

``incremental_distinct_merge`` extends the algebra to distinct counts,
which do NOT merge exactly (yesterday's users overlap today's): the
mergeable carrier is the Datasketches HLL register array —
``hll_union(hll(base), hll(delta))`` yields register-identical state to
``hll(base ∪ delta)`` (registers merge by max), asserted engine-side as
a boolean both estimates agree on, with the exact full recount
hash-checked and the usual error-bound contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

HLL_LGK = 12
HLL_ERR_BOUND = 0.05  # lgK=12 -> rse ~1.6%; 3 sigma


def _split(li: DataFrame, delta: bool) -> DataFrame:
    cond = (F.col("l_orderkey") % 10 == 0) == F.lit(delta)
    return li.where(cond)


def _partial_state(li: DataFrame) -> DataFrame:
    """The stored per-group partial state: every column a semigroup."""
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sq100"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "sp100"
        ),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_qty,
           round((CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                  / 100.0) / count(*), 6) AS avg_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_price,
           CAST(min(l_shipdate) AS VARCHAR) AS min_ship,
           CAST(max(l_shipdate) AS VARCHAR) AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Incremental aggregate maintenance: partial state computed "
    "separately over the base (orderkey%10!=0) and the delta "
    "(orderkey%10==0) slices, then MERGED (sum counts/sums, min mins, "
    "max maxs; avg derived at read time from the merged sum and count "
    "— the non-mergeable measure handled the only correct way). The "
    "oracle recomputes flat over the full table, so the hash match IS "
    "the proof of state(base) ⊕ state(delta) == state(all). Merge "
    "cost is O(groups), independent of base size.",
    tags=["ivm", "relational"],
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    merged = (
        _partial_state(_split(li, delta=False))
        .unionByName(_partial_state(_split(li, delta=True)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sq100").alias("sq100"),
            F.sum("sp100").alias("sp100"),
            F.min("min_ship").alias("min_ship"),
            F.max("max_ship").alias("max_ship"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("sq100").cast("double") / 100.0).alias("sum_qty"),
        F.round(
            (F.col("sq100").cast("double") / 100.0) / F.col("n_rows"), 6
        ).alias("avg_qty"),
        (F.col("sp100").cast("double") / 100.0).alias("sum_price"),
        F.col("min_ship").cast("string").alias("min_ship"),
        F.col("max_ship").cast("string").alias("max_ship"),
    )


@register(
    "incremental_distinct_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_equals_direct,
           TRUE AS estimate_within_bound
    FROM events
    GROUP BY event_type
    """,
    doc="Incremental DISTINCT maintenance per event type: distinct "
    "counts don't merge (slices overlap), so the stored state is the "
    f"Datasketches HLL register array (lgK={HLL_LGK}). The engine "
    "asserts hll_union(sketch(base), sketch(delta)) estimates "
    "IDENTICALLY to the sketch built over the full stream (registers "
    "merge by max — true algebraic state merge), and that the estimate "
    f"sits within {HLL_ERR_BOUND:.0%} of the exact recount, which is "
    "hash-checked. Event slices split by event_id%10. At scale the "
    "maintained state is KBs per group, merge cost O(groups).",
    tags=["ivm", "sketches"],
)
def incremental_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    base = (F.col("event_id") % 10 != 0).cast("int")
    per_type = ev.select(
        "event_type",
        F.when(base == 1, F.col("user_id")).alias("u_base"),
        F.when(base == 0, F.col("user_id")).alias("u_delta"),
        "user_id",
    ).groupBy("event_type").agg(
        F.expr(f"hll_sketch_agg(u_base, {HLL_LGK})").alias("sk_base"),
        F.expr(f"hll_sketch_agg(u_delta, {HLL_LGK})").alias("sk_delta"),
        F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("sk_all"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    merged_est = F.expr("hll_sketch_estimate(hll_union(sk_base, sk_delta))")
    direct_est = F.expr("hll_sketch_estimate(sk_all)")
    return per_type.select(
        "event_type",
        "exact_users",
        (merged_est == direct_est).alias("merged_equals_direct"),
        (
            F.abs(merged_est - F.col("exact_users"))
            <= F.lit(HLL_ERR_BOUND) * F.col("exact_users")
        ).alias("estimate_within_bound"),
    )
