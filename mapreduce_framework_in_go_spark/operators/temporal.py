"""Temporal join operators Spark has no single primitive for: as-of
join and range (interval) join, built as compositions of built-in
DataFrame ops — the scalable formulations, not inequality cross joins.

- **As-of join** (each event matched to the most recent prior order of
  the same user): implemented as union-tag-sort — union both inputs on
  the (user, time) axis, one window sort per user, and carry the last
  seen order forward with ``last(..., ignorenulls=True)``. Cost is ONE
  shuffle + sort of |events| + |orders|; the naive formulation
  (inequality join then argmax per event) shuffles |events| x
  |orders-per-user| pairs. Skewed users degrade the sort partition, not
  the pair count — at 100 TB that's the difference between a working
  plan and an OOM. Ties (several orders at one timestamp) break by the
  sort order (orderkey), deterministically.

- **Range join** (all events inside [o_orderdate, o_orderdate + 7d) of
  the same user): implemented with band bucketing — both sides are
  mapped to 7-day epoch buckets, the range side exploding to the two
  buckets its window can overlap, so the equi-join on (user, bucket)
  bounds fan-out at 2x instead of per-user cross product; the exact
  range predicate filters the candidates. This is the standard
  interval-join pattern (Spark's streaming interval joins and DBR's
  range-join hints do the same under the hood).

The DuckDB oracles use the naive inequality formulations — same
semantics, independent plan — which is exactly what makes them good
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .relational import fsum

RANGE_DAYS = 7


@register(
    "asof_join_event_order",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts,
             o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id,
           CAST(ts AS VARCHAR) AS ts,
           o_orderkey AS asof_orderkey,
           CAST(o_orderdate AS VARCHAR) AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
    doc="As-of join: each event paired with the user's most recent "
    "order at or before the event time (NULL when none). Union-tag-"
    "sort implementation — one shuffle+sort over the merged timeline "
    "per user, last-order carried forward with last(ignorenulls); "
    "ties break by orderkey. The oracle is the naive inequality-join "
    "+ argmax formulation.",
    tags=["temporal"],
)
def asof_join_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        "o_orderdate",
    )
    # Merged timeline: orders sort before events at the same instant
    # (side=0 < side=1) so an order dated exactly at the event time is
    # visible to it; among same-instant orders, higher orderkey sorts
    # later and wins the last().
    left = ev.select(
        F.col("user_id"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    right = orders.select(
        "user_id",
        "t",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    merged = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .withColumn(
            "asof_orderdate", F.last("o_orderdate", ignorenulls=True).over(w)
        )
        .where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("string").alias("ts"),
            "asof_orderkey",
            F.col("asof_orderdate").cast("string").alias("asof_orderdate"),
        )
    )


@register(
    "range_join_pre_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 1 HOUR
     AND e.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="Range join: per purchase event, the same user's activity in "
    "the preceding hour. Band-bucketed implementation — both sides "
    "bucket to 1-hour epoch windows, the purchase side explodes to "
    "the 2 buckets its lookback can overlap, the equi-join on (user, "
    "bucket) bounds candidates at 2x before the exact range filter. "
    "The oracle is the naive inequality join.",
    tags=["temporal"],
)
def range_join_pre_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    sec_per_bucket = 3600
    ev = table(spark, sf_dir, "events")
    # timestampdiff on the NTZ value — unix_timestamp(cast) would
    # interpret the NTZ instant in the session timezone, shifting
    # bucket boundaries under a non-UTC driver session
    bucket_of = lambda c: (  # noqa: E731
        F.expr(f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})")
        / sec_per_bucket
    ).cast("long")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        bucket_of("ts").alias("b0"),
    )
    # a [t-1h, t) lookback overlaps exactly buckets b0-1 and b0
    p_banded = purchases.select(
        "purchase_id",
        "user_id",
        "p_ts",
        F.explode(F.array(F.col("b0") - 1, F.col("b0"))).alias("bucket"),
    )
    activity = ev.select(
        "user_id", "ts", "value", bucket_of("ts").alias("bucket")
    )
    return (
        p_banded.join(activity, ["user_id", "bucket"])
        .where(
            (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_events"),
            fsum(F.col("value"), 100).alias("total_value"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER w AS next_event_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    trans AS (
      SELECT event_type, next_event_type
      FROM seq
      WHERE next_event_type IS NOT NULL
        AND next_ts - ts <= INTERVAL 30 MINUTE
    ),
    counts AS (
      SELECT event_type, next_event_type, count(*) AS c
      FROM trans GROUP BY 1, 2
    ),
    ctx AS (
      SELECT event_type, sum(c) AS c_ctx FROM counts GROUP BY 1
    )
    SELECT counts.event_type, counts.next_event_type,
           CAST(counts.c AS BIGINT) AS c,
           CAST(ctx.c_ctx AS BIGINT) AS c_ctx,
           round(counts.c * 1.0 / ctx.c_ctx, 6) AS p
    FROM counts JOIN ctx USING (event_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "streams: consecutive (event, next-event) pairs within the same "
    "activity burst (gap <= 30 min, the sessionization bound), "
    "counted globally and row-normalized into transition "
    "probabilities. ONE shuffle on user_id feeds the lead window "
    "(shared ordering with sessionization); the count is a two-level "
    "aggregate over the event_type x event_type domain, and the "
    "row-normalizing context totals join back by broadcast — the "
    "matrix is vocabulary-sized, never corpus-sized. The "
    "probability division is a single exact IEEE op, hash-identical "
    "to the oracle. This is the sequence-mining sibling of "
    "lm_kn_bigrams: same count-table discipline, event streams "
    "instead of token streams.",
    tags=["temporal", "events"],
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_event_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    trans = seq.where(
        F.col("next_event_type").isNotNull()
        & (
            (F.col("next_ts") - F.col("ts"))
            <= F.expr("INTERVAL 30 MINUTES")
        )
    )
    counts = trans.groupBy("event_type", "next_event_type").agg(
        F.count("*").alias("c")
    )
    ctx = counts.groupBy("event_type").agg(F.sum("c").alias("c_ctx"))
    return (
        counts.join(F.broadcast(ctx), "event_type")
        .select(
            "event_type",
            "next_event_type",
            F.col("c").cast("long").alias("c"),
            F.col("c_ctx").cast("long").alias("c_ctx"),
            F.round(F.col("c") * F.lit(1.0) / F.col("c_ctx"), 6).alias("p"),
        )
    )


@register(
    "scd2_user_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR event_type != prev_type
    )
    SELECT user_id,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Type-2 slowly-changing-dimension build from a change stream: "
    "each user's event-type CHANGES (vs the previous event) open a "
    "new version row with [valid_from, valid_to) bounds and an "
    "is_current flag — the standard warehouse dimension-history "
    "shape, derived with one user_id window shuffle shared by the "
    "change filter and the versioning (lag to detect the change, "
    "row_number + lead over the change rows to close intervals). "
    "Timestamps render as NTZ wall-clock strings — session-TZ "
    "independent. At 100 TB the same two windows run per user "
    "partition; output is change-count-sized, not event-count-sized.",
    tags=["temporal", "events", "window"],
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return changes.select(
        "user_id",
        F.row_number().over(w2).cast("long").alias("version"),
        F.col("event_type").alias("state"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), fmt).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )
