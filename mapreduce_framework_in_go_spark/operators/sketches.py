"""Sketch-based approximate aggregates — the cardinality path a 100 TB
engine actually runs.

At cluster scale an exact COUNT(DISTINCT user) shuffles every distinct
value; the HyperLogLog++ sketch shuffles a fixed few-KB register array
per group instead (mergeable partial aggregation), turning an
O(distinct) exchange into an O(groups) one. Spark's
``approx_count_distinct`` and DuckDB's ``approx_count_distinct`` use
different HLL implementations, so the approximate VALUE cannot be
hash-compared; the oracle therefore checks the exact counts bitwise and
the engine asserts its sketch's relative error stays inside the bound
as a boolean column (TRUE on both sides — the engine computes it
honestly from the sketch, the oracle states the contract; observed
worst case on this corpus is 6.7% at sf0.1 with rsd=0.05, bound 15%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

HLL_RSD = 0.05  # target relative standard deviation of the sketch
HLL_ERR_BOUND = 0.15  # asserted per-group relative-error ceiling


@register(
    "approx_distinct_users",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS sketch_within_bound
    FROM events
    GROUP BY event_type
    """,
    doc=f"Distinct-user cardinality per event type, exact AND via "
    f"HyperLogLog++ (rsd={HLL_RSD}): the exact counts are "
    "hash-checked against the oracle; the sketch estimate is asserted "
    f"to sit within {HLL_ERR_BOUND:.0%} relative error of the exact "
    "count per group (the oracle states the contract as TRUE; the "
    "engine computes the comparison from its real sketch — a "
    "cross-implementation value match is impossible because Spark and "
    "DuckDB run different HLL variants). At scale the sketch path "
    "shuffles fixed-size registers, not distinct values.",
    tags=["sketches"],
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    approx = F.approx_count_distinct("user_id", HLL_RSD)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact.alias("exact_users"),
        (
            F.abs(approx - exact) <= F.lit(HLL_ERR_BOUND) * exact
        ).alias("sketch_within_bound"),
    )


PCTL_ACCURACY = 100  # GK sketch accuracy: rank error <= 1/accuracy
PCTL_RANK_EPS = 2.0 / PCTL_ACCURACY  # asserted bound (2x the guarantee)


@register(
    "approx_percentile_prices",
    oracle=f"""
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4)
             AS exact_p50,
           round(CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE), 4)
             AS exact_p95,
           TRUE AS p50_within_rank_eps,
           TRUE AS p95_within_rank_eps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=f"Quantile sketch contract per return flag: the exact "
    "interpolated p50/p95 are hash-checked against the oracle, and the "
    f"Greenwald-Khanna sketch (percentile_approx, accuracy="
    f"{PCTL_ACCURACY}) is asserted to land between the exact quantiles "
    f"at p +/- {PCTL_RANK_EPS} — the rank-error guarantee the sketch "
    "ships with, stated in VALUE space via two more exact quantiles "
    "(cross-implementation value match is impossible; the rank bound "
    "is the honest contract, same discipline as the HLL query). At "
    "scale the sketch shuffles fixed-size summaries instead of "
    "sorting groups.",
    tags=["sketches"],
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")

    def exact(p: float):
        return F.expr(f"percentile(l_extendedprice, {p})")

    def approx(p: float):
        return F.expr(
            f"approx_percentile(l_extendedprice, {p}, {PCTL_ACCURACY})"
        )

    def within(p: float):
        return (approx(p) >= exact(p - PCTL_RANK_EPS)) & (
            approx(p) <= exact(p + PCTL_RANK_EPS)
        )

    return li.groupBy("l_returnflag").agg(
        F.round(exact(0.5), 4).alias("exact_p50"),
        F.round(exact(0.95), 4).alias("exact_p95"),
        within(0.5).alias("p50_within_rank_eps"),
        within(0.95).alias("p95_within_rank_eps"),
    )
