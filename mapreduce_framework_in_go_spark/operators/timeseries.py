"""Time-series regularization: resample an irregular event stream onto
a fixed per-entity grid with gap-fill (last observation carried
forward).

The reference's event surface stops at windowed aggregation; every
production metrics/feature pipeline also needs the inverse shape —
turning irregular observations into a dense regular series so
downstream joins and models see one row per (entity, tick). This is
that operator, built scale-first:

1. pre-aggregate events to (user, hour) — ONE shuffle collapses the
   raw stream to at most |users| x |span-hours| rows; the last
   observation in each hour is picked with ``max_by`` over the
   (ts, event_id) struct, so ties are deterministic;
2. the dense grid is generated from each user's own [min_hour,
   max_hour] span via ``sequence`` + ``explode`` — map-side fan-out
   bounded by span-hours per user, never a global calendar cross join;
3. forward-fill is one window ``last(value, ignorenulls=True)`` per
   user over the grid — state per partition is O(1), and a skewed user
   costs span-hours rows (the grid), not their raw event count (already
   collapsed in step 1).

At 100 TB the same plan holds: the expensive cardinality (raw events)
is reduced before any per-entity window, and the grid size is a
function of entity count x resolution, which is the OUTPUT size — the
operator never materializes anything asymptotically larger than its
result. The DuckDB oracle builds the same grid with generate_series
and fills with last_value IGNORE NULLS — independent plan, same
semantics. Filled values are raw column doubles carried through
(no arithmetic), so they hash bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table


@register(
    "resample_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             arg_max(value, ts + INTERVAL (event_id % 1000000) MICROSECOND)
               AS last_value
      FROM events
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(hour) AS h0, max(hour) AS h1
      FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM spans
    )
    SELECT g.user_id,
           strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           coalesce(h.n_events, 0) AS n_events,
           last_value(h.last_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour) AS value_ffill,
           h.n_events IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    """,
    doc="Resample each user's irregular event stream onto a dense "
    "hourly grid over their own active span; hours with no events are "
    "gap-filled by carrying the last observed value forward. "
    "Pre-aggregate -> per-user sequence() grid -> one ffill window; "
    "see module docstring for the 100 TB cost argument. Oracle: "
    "generate_series + last_value IGNORE NULLS.",
    tags=["timeseries", "events"],
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Deterministic "last observation in the hour": max_by over the
    # (ts, event_id) order. The oracle mirrors the tie-break by adding
    # event_id-derived microseconds to ts (raw ts has microsecond
    # resolution; events within one microsecond are broken by id —
    # arg_max over a plain composite is not available in both engines
    # with identical NULL semantics, this encoding is).
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.max_by(
                "value",
                F.col("ts")
                + F.expr("make_interval(0, 0, 0, 0, 0, 0, (event_id % 1000000) / 1e6)"),
            ).alias("last_value"),
        )
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("value_ffill", F.last("last_value", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "value_ffill",
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


@register(
    "events_trailing_median",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id,
             list_sort(list(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
             )) AS l
      FROM events
    )
    SELECT user_id, event_id,
           CAST(len(l) AS BIGINT) AS n_frame,
           CAST(l[(len(l) + 1) // 2] + l[len(l) // 2 + 1] AS DOUBLE)
             / 2 / 100 AS trailing_median
    FROM f
    """,
    doc="Exact rolling MEDIAN over a trailing 1-hour time frame per "
    "user — the holistic analytic no distributive window aggregate "
    "expresses: the frame's values are collected (RANGE interval "
    "frame), sorted, and the midpoint interpolated in fixed-point "
    "cents, so engine and oracle share the identical integer-sort + "
    "midpoint arithmetic (no reliance on either engine's internal "
    "quantile interpolation tree). One user_id shuffle; per-row cost "
    "is O(frame log frame) and per-row state is the frame itself — "
    "the honest price of exactness; a wide-frame production variant "
    "swaps in the GK sketch (approx_percentile_prices contract).",
    tags=["timeseries", "events", "window"],
)
def events_trailing_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.selectExpr(
        "user_id",
        "event_id",
        "array_sort(collect_list(CAST(round(value * 100) AS BIGINT)) OVER ("
        "  PARTITION BY user_id ORDER BY ts"
        "  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)) AS l",
    ).selectExpr(
        "user_id",
        "event_id",
        "CAST(size(l) AS BIGINT) AS n_frame",
        "CAST(element_at(l, CAST((size(l) + 1) / 2 AS INT))"
        "   + element_at(l, CAST(size(l) / 2 AS INT) + 1) AS DOUBLE)"
        " / 2 / 100 AS trailing_median",
    )
