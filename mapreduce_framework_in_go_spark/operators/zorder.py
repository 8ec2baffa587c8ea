"""Z-order (Morton) multi-dimensional clustering — the write-time layout
that makes 2-D predicates prunable from parquet min/max stats.

1-D sort clustering (sources/layout.py:write_clustered) gives disjoint
file ranges on ONE column; a predicate on any other column scans every
file. Interleaving the bits of two quantized dimensions orders rows
along a space-filling curve, so every contiguous bucket of the z-axis
covers a TIGHT rectangle in (x, y) space — both dimensions' min/max
footer stats become selective at once.

``zorder_layout`` computes the whole story inside one deterministic
query the oracle replays bitwise: quantize o_custkey and the
o_orderdate epoch-day to 8 bits each (range bounds ride a broadcast
1-row aggregate — no driver action), interleave to a 16-bit z-value,
split the z-axis into 16 equal buckets (the model of 16 output files),
and report each bucket's row count and per-dimension extents alongside
the same stats for the custkey-only linear layout. Two probe flags per
bucket evaluate the min/max pruning decision a scan would make for an
x-box and a y-box predicate: the z-layout prunes on BOTH axes, the
linear layout only on its sort axis — the measured result
tests/test_zorder.py pins (y-probe: z-order scans a strict subset of
the linear layout's buckets).

``sources/layout.py:write_zordered`` applies the same curve at write
time (repartitionByRange over the z-value) for real parquet output; at
100 TB the quantization bounds come from the same 1-row aggregate and
the curve assignment stays map-side, so the only cost over a plain
write is the range exchange every clustered write already pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

Q_BITS = 8  # per-dimension quantization width
N_BUCKETS = 16  # modeled output files per layout
# probe boxes in quantized space: a 1/8-wide band on each axis
PROBE_LO, PROBE_HI = 96, 127


def z_interleave(qx: Column, qy: Column, bits: int = Q_BITS) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints; x takes
    the odd (higher) bit positions. Pure integer arithmetic (shift =
    divide, mask = mod) so any engine reproduces it bitwise."""
    z = F.lit(0)
    for i in range(bits):
        xbit = (qx.cast("long") / F.lit(1 << i)).cast("long") % 2
        ybit = (qy.cast("long") / F.lit(1 << i)).cast("long") % 2
        z = z + xbit * F.lit(1 << (2 * i + 1)) + ybit * F.lit(1 << (2 * i))
    return z


def _z_sql(qx: str, qy: str, bits: int = Q_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({qx} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({qy} // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


_DAY = "date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)"
_Q = f"""
      SELECT o_orderkey,
             ((o_custkey - xmin) * {1 << Q_BITS}) // (xmax - xmin + 1) AS qx,
             (({_DAY} - ymin) * {1 << Q_BITS}) // (ymax - ymin + 1) AS qy
      FROM orders,
           (SELECT min(o_custkey) AS xmin, max(o_custkey) AS xmax,
                   min({_DAY}) AS ymin, max({_DAY}) AS ymax
            FROM orders)
"""


@register(
    "zorder_layout",
    oracle=f"""
    WITH q AS ({_Q}),
    laid AS (
      SELECT 'zorder' AS layout,
             ({_z_sql("qx", "qy")}) // {(1 << (2 * Q_BITS)) // N_BUCKETS}
               AS bucket,
             qx, qy
      FROM q
      UNION ALL
      SELECT 'linear' AS layout,
             (qx * {1 << Q_BITS} + qy) // {(1 << (2 * Q_BITS)) // N_BUCKETS}
               AS bucket,
             qx, qy
      FROM q
    )
    SELECT layout, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(qx) AS BIGINT) AS min_qx, CAST(max(qx) AS BIGINT) AS max_qx,
           CAST(min(qy) AS BIGINT) AS min_qy, CAST(max(qy) AS BIGINT) AS max_qy,
           min(qx) <= {PROBE_HI} AND max(qx) >= {PROBE_LO} AS hits_x_probe,
           min(qy) <= {PROBE_HI} AND max(qy) >= {PROBE_LO} AS hits_y_probe
    FROM laid GROUP BY 1, 2
    """,
    doc="Z-order vs linear clustering, measured: orders quantized to "
    f"{Q_BITS}-bit (custkey, orderdate-day) coordinates, laid out into "
    f"{N_BUCKETS} buckets either along the Morton curve or by custkey "
    "alone; per bucket the row count, both dimensions' min/max extents "
    "(what parquet footers would store), and whether an x-band / "
    "y-band predicate could prune the bucket. The z-layout's buckets "
    "have tight extents on BOTH axes — the y-probe scans a strict "
    "subset of what the linear layout scans (pinned in "
    "tests/test_zorder.py). Bounds ride a broadcast 1-row aggregate; "
    "curve assignment is map-side integer arithmetic.",
    tags=["layout"],
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    day = F.expr(
        "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    bounds = o.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min(day).alias("ymin"),
        F.max(day).alias("ymax"),
    )
    q = o.select(
        "o_orderkey", F.col("o_custkey").alias("x"), day.alias("y")
    ).crossJoin(F.broadcast(bounds))
    scale = F.lit(1 << Q_BITS)
    qx = ((F.col("x") - F.col("xmin")) * scale / (
        F.col("xmax") - F.col("xmin") + 1
    )).cast("long")
    qy = ((F.col("y") - F.col("ymin")) * scale / (
        F.col("ymax") - F.col("ymin") + 1
    )).cast("long")
    qq = q.select(qx.alias("qx"), qy.alias("qy"))
    per_bucket_div = (1 << (2 * Q_BITS)) // N_BUCKETS
    z_bucket = (z_interleave(F.col("qx"), F.col("qy")) / per_bucket_div).cast(
        "long"
    )
    lin_bucket = (
        (F.col("qx") * (1 << Q_BITS) + F.col("qy")) / per_bucket_div
    ).cast("long")
    both = qq.select(
        F.lit("zorder").alias("layout"), z_bucket.alias("bucket"), "qx", "qy"
    ).unionByName(
        qq.select(
            F.lit("linear").alias("layout"),
            lin_bucket.alias("bucket"),
            "qx",
            "qy",
        )
    )
    return both.groupBy("layout", "bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("qx").alias("min_qx"),
        F.max("qx").alias("max_qx"),
        F.min("qy").alias("min_qy"),
        F.max("qy").alias("max_qy"),
        (
            (F.min("qx") <= PROBE_HI) & (F.max("qx") >= PROBE_LO)
        ).alias("hits_x_probe"),
        (
            (F.min("qy") <= PROBE_HI) & (F.max("qy") >= PROBE_LO)
        ).alias("hits_y_probe"),
    )
