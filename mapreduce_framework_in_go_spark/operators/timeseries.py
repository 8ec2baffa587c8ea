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


EWMA_ALPHA = 0.25  # level smoothing — EXACT dyadic, so a*x is one
EWMA_BETA = 0.5  # trend smoothing — also dyadic
FORECAST_H = 3  # forecast horizon (hours ahead of the last observation)


@register(
    "ewma_holt_forecast",
    oracle=f"""
    WITH RECURSIVE hx AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY h)
               AS idx
      FROM hx
    ),
    fold AS (
      SELECT event_type, idx, x,
             x AS s, x AS l, CAST(0 AS DOUBLE) AS b
      FROM ser WHERE idx = 1
      UNION ALL
      SELECT s.event_type, s.idx, s.x,
             {EWMA_ALPHA} * s.x + {1 - EWMA_ALPHA} * f.s,
             {EWMA_ALPHA} * s.x + {1 - EWMA_ALPHA} * (f.l + f.b),
             {EWMA_BETA} * (({EWMA_ALPHA} * s.x
                             + {1 - EWMA_ALPHA} * (f.l + f.b)) - f.l)
               + {1 - EWMA_BETA} * f.b
      FROM ser s
      JOIN fold f
        ON s.event_type = f.event_type AND f.idx + 1 = s.idx
    ),
    tail AS (SELECT event_type, max(idx) AS n FROM ser GROUP BY 1)
    SELECT f.event_type,
           CAST(t.n AS BIGINT) AS n_hours,
           round(f.s, 6) AS ewma,
           round(f.l, 6) AS holt_level,
           round(f.b, 6) AS holt_trend,
           round(f.l + {FORECAST_H}.0 * f.b, 6) AS forecast_3h
    FROM fold f JOIN tail t
      ON f.event_type = t.event_type AND f.idx = t.n
    """,
    doc=f"Exponential smoothing per event type — simple EWMA (alpha="
    f"{EWMA_ALPHA}) and Holt's linear trend method (beta={EWMA_BETA}) "
    "folded left over the hourly revenue series, plus the "
    f"{FORECAST_H}-hour-ahead forecast level + h*trend. The recurrences "
    "are evaluated on an IDENTICAL IEEE expression tree in both "
    "engines — the smoothing constants are exact dyadics, every step "
    "is the same two correctly-rounded multiplies and one add in the "
    "same order, and the trend step textually re-derives the new level "
    "on both sides — so a 720-step float recursion hash-matches "
    "bitwise under round(6) (engine: one array_sort + F.aggregate "
    "struct fold per group; oracle: a recursive CTE walking idx). "
    "Scale: the raw stream collapses to (type, hour) in ONE partial-"
    "aggregated shuffle (the fsum fixed-point convention), and the "
    "fold state is O(1) per group — series length bounds the array, "
    "span-hours x groups = output-sized work, never event-sized.",
    tags=["timeseries"],
)
def ewma_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hx = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast(
                "double"
            )
            / 100.0
        ).alias("x")
    )
    ser = hx.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("h", "x"))).alias("arr")
    )
    a, ia = F.lit(EWMA_ALPHA), F.lit(1 - EWMA_ALPHA)
    bt, ibt = F.lit(EWMA_BETA), F.lit(1 - EWMA_BETA)

    def step(acc, e):
        x = e["x"]
        first = acc["n"] == 0
        new_l = a * x + ia * (acc["l"] + acc["b"])
        return F.struct(
            (acc["n"] + F.lit(1).cast("long")).alias("n"),
            F.when(first, x).otherwise(a * x + ia * acc["s"]).alias("s"),
            F.when(first, x).otherwise(new_l).alias("l"),
            F.when(first, F.lit(0.0))
            .otherwise(bt * (new_l - acc["l"]) + ibt * acc["b"])
            .alias("b"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("s"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
    )
    folded = ser.select(
        "event_type", F.aggregate("arr", init, step).alias("f")
    )
    return folded.select(
        "event_type",
        F.col("f.n").alias("n_hours"),
        F.round("f.s", 6).alias("ewma"),
        F.round("f.l", 6).alias("holt_level"),
        F.round("f.b", 6).alias("holt_trend"),
        F.round(
            F.col("f.l") + F.lit(float(FORECAST_H)) * F.col("f.b"), 6
        ).alias("forecast_3h"),
    )
