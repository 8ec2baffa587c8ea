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


KMV_K = 64  # bottom-k signature size; Jaccard rse ~ 1/sqrt(K) = 0.125
KMV_SALTS = 32  # first-level fan-in for the two-level bottom-k
KMV_ERR_BOUND = 0.35  # asserted |estimate - exact| ceiling (~3 sigma)


@register(
    "kmv_overlap_events",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    sig AS (
      SELECT event_type, user_id, h FROM (
        SELECT *, row_number() OVER (
          PARTITION BY event_type ORDER BY h, user_id) AS rn
        FROM du
      ) WHERE rn <= {KMV_K}
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM du) a
      JOIN (SELECT DISTINCT event_type FROM du) b
        ON a.event_type < b.event_type
    ),
    merged AS (
      SELECT p.type_a, p.type_b, s.user_id, s.h,
             max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p
      JOIN sig s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY 1, 2, 3, 4
    ),
    bottomk AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY type_a, type_b ORDER BY h, user_id) AS rn
        FROM merged
      ) WHERE rn <= {KMV_K}
    ),
    est AS (
      SELECT type_a, type_b,
             sum(in_a * in_b) AS n_both, count(*) AS k_used
      FROM bottomk GROUP BY 1, 2
    ),
    exact AS (
      SELECT p.type_a, p.type_b,
             count(DISTINCT CASE WHEN ia.user_id IS NOT NULL
                                  AND ib.user_id IS NOT NULL
                             THEN du.user_id END) AS n_inter,
             count(DISTINCT du.user_id) AS n_union
      FROM pairs p
      JOIN du ON du.event_type IN (p.type_a, p.type_b)
      LEFT JOIN (SELECT DISTINCT event_type, user_id FROM du) ia
        ON ia.event_type = p.type_a AND ia.user_id = du.user_id
      LEFT JOIN (SELECT DISTINCT event_type, user_id FROM du) ib
        ON ib.event_type = p.type_b AND ib.user_id = du.user_id
      GROUP BY 1, 2
    )
    SELECT e.type_a, e.type_b,
           round(est.n_both * 1.0 / est.k_used, 6) AS est_jaccard,
           round(e.n_inter * 1.0 / e.n_union, 6) AS exact_jaccard,
           TRUE AS within_bound
    FROM exact e JOIN est USING (type_a, type_b)
    """,
    doc=f"Cross-audience overlap via KMV (bottom-k) signatures: each "
    f"event type keeps the {KMV_K} smallest md5-hashed distinct users "
    "as its signature; a pair's Jaccard is estimated from the fraction "
    "of the merged signature's bottom-k present in both — the sketch "
    "is DETERMINISTIC (md5 order), so the oracle reproduces the "
    "estimate bitwise, a stronger check than the HLL bound contract. "
    f"Engine-side the bottom-k is TWO-LEVEL: per (type, h%{KMV_SALTS}) "
    "pre-top-k, then final top-k over the 32xK survivors — the per-type "
    "sort never sees the full audience, which is what makes per-segment "
    "signatures computable over billions of users. Exact Jaccard rides "
    f"along (audiences are few) and the estimate is asserted within "
    f"{KMV_ERR_BOUND} absolute error.",
    tags=["sketches"],
)
def kmv_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import md5_long32

    ev = table(spark, sf_dir, "events")
    du = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", md5_long32(F.col("user_id").cast("string")))
    )
    # two-level bottom-k: local candidates per hash-salt, then final
    w_local = Window.partitionBy("event_type", F.pmod("h", F.lit(KMV_SALTS))).orderBy(
        "h", "user_id"
    )
    cand = du.withColumn("lrn", F.row_number().over(w_local)).where(
        F.col("lrn") <= KMV_K
    )
    w_final = Window.partitionBy("event_type").orderBy("h", "user_id")
    sig = (
        cand.withColumn("rn", F.row_number().over(w_final))
        .where(F.col("rn") <= KMV_K)
        .select("event_type", "user_id", "h")
        .persist()
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    merged = (
        pairs.join(
            sig,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "user_id", "h")
        .agg(
            F.max((F.col("event_type") == F.col("type_a")).cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("event_type") == F.col("type_b")).cast("int")).alias(
                "in_b"
            ),
        )
    )
    w_pair = Window.partitionBy("type_a", "type_b").orderBy("h", "user_id")
    est = (
        merged.withColumn("rn", F.row_number().over(w_pair))
        .where(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
            F.count("*").alias("k_used"),
        )
    )
    # exact audience overlap (few types -> tiny frames)
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count_distinct("user_id").alias("n_inter"))
    )
    uni = (
        pairs.join(
            du,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count_distinct("user_id").alias("n_union"))
    )
    ej = F.round(F.col("n_both") / F.col("k_used"), 6)
    xj = F.round(F.col("n_inter") / F.col("n_union"), 6)
    return (
        est.join(inter, ["type_a", "type_b"])
        .join(uni, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            ej.alias("est_jaccard"),
            xj.alias("exact_jaccard"),
            (F.abs(ej - xj) <= KMV_ERR_BOUND).alias("within_bound"),
        )
    )


TRAIL_HOURS = 3  # trailing window width (hours)
HLL_LGK_TRAIL = 14  # registers per hourly sketch (rse ~0.8%)
TRAIL_ERR_BOUND = 0.1  # asserted per-window relative-error ceiling


@register(
    "trailing_distinct_users",
    oracle=f"""
    WITH hu AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour, user_id
      FROM events
    ),
    expanded AS (
      SELECT event_type, hour + INTERVAL (k) HOUR AS whour, user_id
      FROM hu, unnest(generate_series(0, {TRAIL_HOURS - 1})) AS u(k)
    ),
    trail AS (
      SELECT event_type, whour, count(DISTINCT user_id) AS exact_trailing
      FROM expanded GROUP BY 1, 2
    ),
    hours AS (SELECT DISTINCT event_type, hour FROM hu)
    SELECT t.event_type,
           strftime(t.whour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(t.exact_trailing AS BIGINT) AS exact_trailing,
           TRUE AS sketch_within_bound
    FROM trail t
    JOIN hours h ON h.event_type = t.event_type AND h.hour = t.whour
    """,
    doc=f"Trailing {TRAIL_HOURS}-hour distinct users per event type for "
    "every active hour — the sliding-DISTINCT shape COUNT(DISTINCT) "
    "OVER cannot express. Exact path: each (hour, user) row expands to "
    f"the {TRAIL_HOURS} windows it covers (fan-out = width/slide, the "
    "sliding-window discipline), then one distinct count per window. "
    "Sketch path: per-hour HLL register arrays merged across the "
    "trailing frame with hll_union_agg as a WINDOW aggregate — state "
    "KBs per hour regardless of audience size, the only viable form "
    "once hourly audiences stop fitting a shuffle. The estimate is "
    "asserted within the HLL bound of the exact count (TRUE on both "
    "sides; windows over trailing hours that include the type's first "
    "hours use whatever hours exist, matching the oracle's join).",
    tags=["sketches", "timeseries"],
)
def trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    hu = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour"), "user_id"
    ).distinct()
    # exact: expand each hour-user to the TRAIL_HOURS windows it covers
    expanded = hu.select(
        "event_type",
        F.explode(
            F.sequence(F.lit(0), F.lit(TRAIL_HOURS - 1))
        ).alias("k"),
        "hour",
        "user_id",
    ).select(
        "event_type",
        (F.col("hour") + F.make_interval(hours=F.col("k"))).alias("whour"),
        "user_id",
    )
    trail = expanded.groupBy("event_type", "whour").agg(
        F.count_distinct("user_id").alias("exact_trailing")
    )
    # sketch: per-hour registers, window-merged across the trailing frame
    hourly_sk = hu.groupBy("event_type", "hour").agg(
        F.expr(f"hll_sketch_agg(user_id, {HLL_LGK_TRAIL})").alias("sk")
    ).withColumn(
        # RANGE frame over CLOCK hours: a rows-based frame would merge
        # the last 3 PRESENT hours and silently widen across gaps
        "hnum",
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', hour)"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hnum")
        .rangeBetween(-(TRAIL_HOURS - 1), Window.currentRow)
    )
    sk_trail = hourly_sk.select(
        "event_type",
        "hour",
        F.expr("hll_union_agg(sk)").over(w).alias("sk_merged"),
    ).select(
        "event_type",
        "hour",
        F.expr("hll_sketch_estimate(sk_merged)").alias("est"),
    )
    sk_trail = sk_trail.select(
        F.col("event_type").alias("sk_type"),
        F.col("hour").alias("sk_hour"),
        "est",
    )
    return (
        trail.join(
            sk_trail,
            (F.col("event_type") == F.col("sk_type"))
            & (F.col("whour") == F.col("sk_hour")),
        )
        .select(
            F.col("event_type"),
            F.date_format("whour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("exact_trailing").cast("long").alias("exact_trailing"),
            (
                F.abs(F.col("est") - F.col("exact_trailing"))
                <= F.lit(TRAIL_ERR_BOUND) * F.col("exact_trailing")
            ).alias("sketch_within_bound"),
        )
    )
