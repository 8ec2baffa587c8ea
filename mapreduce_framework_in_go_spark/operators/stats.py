"""Planning statistics — the numbers a cost-based optimizer (or the
engineer sizing a 100 TB job) computes BEFORE running the expensive
plan.

``join_size_estimate`` is the textbook CBO containment estimate:
|A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) per equi-join key, computed from
one aggregate pass over each side, then compared against the TRUE join
cardinality so the estimate's error is part of the checked output.
Misestimating a join by 100× is how a broadcast becomes an OOM at
scale; this is the guardrail artifact. NDVs are exact here and swap
for HLL sketches (`approx_distinct_users` discipline) when the key
domain outgrows exact counting.

``skew_topkeys`` is the pre-salting diagnosis: the heaviest join/group
keys with their share of all rows and their multiple of the mean key
load — the factor that predicts the straggler. The top-k ride a
TakeOrdered-style rank over per-key counts (one shuffle, map-side
combined); at 100 TB the same two-phase count is the only way to see
skew without sorting the key domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

TOP_SKEW = 10


@register(
    "join_size_estimate",
    oracle="""
    WITH li AS (
      SELECT count(*) AS n, count(DISTINCT l_orderkey) AS ndv FROM lineitem
    ),
    o AS (
      SELECT count(*) AS n, count(DISTINCT o_orderkey) AS ndv FROM orders
    ),
    ev AS (
      SELECT count(*) AS n, count(DISTINCT user_id) AS ndv FROM events
    ),
    c AS (
      SELECT count(*) AS n, count(DISTINCT c_custkey) AS ndv FROM customer
    ),
    actual_lo AS (
      SELECT count(*) AS n FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
    ),
    actual_ec AS (
      SELECT count(*) AS n FROM events
      JOIN customer ON user_id = c_custkey
    )
    SELECT 'lineitem x orders ON orderkey' AS join_name,
           CAST(li.n AS BIGINT) AS left_rows,
           CAST(o.n AS BIGINT) AS right_rows,
           CAST(li.ndv AS BIGINT) AS left_ndv,
           CAST(o.ndv AS BIGINT) AS right_ndv,
           CAST(li.n * o.n / greatest(li.ndv, o.ndv) AS BIGINT)
             AS est_rows,
           CAST(actual_lo.n AS BIGINT) AS actual_rows,
           round(li.n * o.n / greatest(li.ndv, o.ndv)
                 * 1.0 / actual_lo.n, 4) AS est_over_actual
    FROM li, o, actual_lo
    UNION ALL
    SELECT 'events x customer ON custkey',
           CAST(ev.n AS BIGINT), CAST(c.n AS BIGINT),
           CAST(ev.ndv AS BIGINT), CAST(c.ndv AS BIGINT),
           CAST(ev.n * c.n / greatest(ev.ndv, c.ndv) AS BIGINT),
           CAST(actual_ec.n AS BIGINT),
           round(ev.n * c.n / greatest(ev.ndv, c.ndv)
                 * 1.0 / actual_ec.n, 4)
    FROM ev, c, actual_ec
    """,
    doc="CBO containment estimate |A|*|B|/max(ndv) for two equi-joins, "
    "checked against the true join cardinality (est_over_actual is the "
    "misestimation factor). Each side's (count, NDV) is ONE aggregate "
    "pass; the actual count is the verification baseline a production "
    "stats job would sample instead. Exact NDV swaps for an HLL sketch "
    "at extreme key cardinality.",
    tags=["stats"],
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")

    def side(df: DataFrame, key: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"), F.count_distinct(key).alias("ndv")
        )

    def one(
        name: str, a: DataFrame, ak: str, b: DataFrame, bk: str
    ) -> DataFrame:
        sa = side(a, ak)
        sb = side(b, bk).select(
            F.col("n").alias("bn"), F.col("ndv").alias("bndv")
        )
        actual = (
            a.select(F.col(ak).alias("k"))
            .join(b.select(F.col(bk).alias("k")), "k")
            .agg(F.count("*").alias("actual"))
        )
        est = (F.col("n") * F.col("bn") / F.greatest("ndv", "bndv")).cast(
            "long"
        )
        return (
            sa.crossJoin(F.broadcast(sb))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                F.col("n").alias("left_rows"),
                F.col("bn").alias("right_rows"),
                F.col("ndv").alias("left_ndv"),
                F.col("bndv").alias("right_ndv"),
                est.alias("est_rows"),
                F.col("actual").alias("actual_rows"),
                F.round(est / F.col("actual"), 4).alias("est_over_actual"),
            )
        )

    return one(
        "lineitem x orders ON orderkey", li, "l_orderkey", o, "o_orderkey"
    ).unionByName(
        one("events x customer ON custkey", ev, "user_id", c, "c_custkey")
    )


@register(
    "skew_topkeys",
    oracle=f"""
    WITH per_key AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY 1
    ),
    tot AS (
      SELECT sum(n) AS total, count(*) AS n_keys, avg(n) AS mean_n
      FROM per_key
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_rows,
           round(n * 1.0 / total, 6) AS share,
           round(n / mean_n, 4) AS x_mean,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT p.*, t.total, t.mean_n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rank
      FROM per_key p, tot t
    ) WHERE rank <= {TOP_SKEW}
    """,
    doc=f"Skew diagnosis: the {TOP_SKEW} heaviest event keys with their "
    "row share and multiple of the mean key load — the artifact that "
    "decides whether a join needs salting before the 100 TB run. "
    "Per-key counts map-side combine; only the tiny count frame "
    "reaches the top-k rank (TakeOrdered shape over keys, never rows); "
    "corpus totals ride a broadcast 1-row aggregate.",
    tags=["stats", "skew"],
)
def skew_topkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_keys"),
        F.avg("n").alias("mean_n"),
    )
    # top-k via orderBy+limit => TakeOrderedAndProject (per-partition
    # heaps + merge of k), never a single-partition sort of the key
    # domain; the rank window then runs over the k surviving rows only.
    top = (
        per_key.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(TOP_SKEW)
    )
    w = Window.orderBy(F.col("n").desc(), "user_id")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "user_id",
            F.col("n").alias("n_rows"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("mean_n"), 4).alias("x_mean"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# Pearson correlation + OLS fit per column pair, from EXACT integer
# moment sums. The four lineitem measures carry <= 2 decimal digits, so
# x*100 is integral; sums of squares/products can pass 2^63 at bench SF,
# so the moment accumulation runs in DECIMAL(38,0) (HUGEINT on the
# oracle side) — still exact integer arithmetic — and only the final
# closed-form expressions drop to IEEE doubles via the deterministic
# integer->double cast. Both engines then evaluate the identical
# expression tree, so corr/slope/intercept hash-match at round-6.
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
CORR_SCALE = 100


def _corr_pairs() -> list[tuple[str, str]]:
    return [
        (CORR_COLS[i], CORR_COLS[j])
        for i in range(len(CORR_COLS))
        for j in range(i + 1, len(CORR_COLS))
    ]


def _corr_oracle() -> str:
    def mom(c):
        return f"CAST(CAST(round({c} * {CORR_SCALE}) AS BIGINT) AS HUGEINT)"

    sums = ", ".join(
        f"sum({mom(c)}) AS s_{c}, sum({mom(c)} * {mom(c)}) AS ss_{c}"
        for c in CORR_COLS
    )
    cross = ", ".join(
        f"sum({mom(x)} * {mom(y)}) AS sp_{x}_{y}" for x, y in _corr_pairs()
    )
    selects = []
    for x, y in _corr_pairs():
        sx, sy = f"CAST(m.s_{x} AS DOUBLE)", f"CAST(m.s_{y} AS DOUBLE)"
        sxx, syy = f"CAST(m.ss_{x} AS DOUBLE)", f"CAST(m.ss_{y} AS DOUBLE)"
        sxy = f"CAST(m.sp_{x}_{y} AS DOUBLE)"
        n = "CAST(m.n AS DOUBLE)"
        cov = f"({n} * {sxy} - {sx} * {sy})"
        vx = f"({n} * {sxx} - {sx} * {sx})"
        vy = f"({n} * {syy} - {sy} * {sy})"
        selects.append(
            f"""SELECT '{x}' AS col_x, '{y}' AS col_y,
               CAST(m.n AS BIGINT) AS n,
               round({cov} / (sqrt({vx}) * sqrt({vy})), 6) AS corr,
               round({cov} / {vx}, 6) AS slope,
               round(({sy} - {cov} / {vx} * {sx}) / {n} / {CORR_SCALE}, 6)
                 AS intercept
            FROM m"""
        )
    body = "\nUNION ALL\n".join(selects)
    return f"""
    WITH m AS (
      SELECT count(*) AS n, {sums}, {cross} FROM lineitem
    )
    {body}
    """


@register(
    "corr_matrix_lineitem",
    oracle=_corr_oracle(),
    doc="Pearson correlation matrix + per-pair OLS fit (slope, "
    "intercept in original units) over the four lineitem measures — "
    "the profiling pass a feature-engineering pipeline runs before "
    "modeling. ONE aggregate scan accumulates every moment (count, "
    "sums, squares, cross-products) as exact DECIMAL(38,0) integers "
    "— order-free, overflow-safe past 2^63 — and the closed forms "
    "evaluate on the single broadcast moment row. Adding a column "
    "adds moments, never a pass. The intercept's slope subterm "
    "repeats the slope expression verbatim so both engines' "
    "expression trees stay identical.",
    tags=["stats"],
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")

    def mom(c: str):
        return (
            F.round(F.col(c) * CORR_SCALE)
            .cast("long")
            .cast("decimal(38,0)")
        )

    aggs = [F.count("*").alias("n")]
    for c in CORR_COLS:
        aggs.append(F.sum(mom(c)).alias(f"s_{c}"))
        aggs.append(F.sum(mom(c) * mom(c)).alias(f"ss_{c}"))
    for x, y in _corr_pairs():
        aggs.append(F.sum(mom(x) * mom(y)).alias(f"sp_{x}_{y}"))
    m = li.agg(*aggs)

    # all 6 pair rows come off the ONE moment row via explode — a
    # unionAll of per-pair selects would plan 6 independent aggregates
    # (6 scans of lineitem)
    pair_structs = []
    for x, y in _corr_pairs():
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{x}").cast("double"), F.col(f"s_{y}").cast("double")
        sxx, syy = F.col(f"ss_{x}").cast("double"), F.col(f"ss_{y}").cast("double")
        sxy = F.col(f"sp_{x}_{y}").cast("double")
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        pair_structs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("corr"),
                F.round(cov / vx, 6).alias("slope"),
                F.round(
                    (sy - cov / vx * sx) / n / F.lit(CORR_SCALE), 6
                ).alias("intercept"),
            )
        )
    return (
        m.select(F.explode(F.array(*pair_structs)).alias("r"))
        .select("r.*")
    )


# Categorical-dependence profiling: mutual information (bits) +
# chi-square over two-column contingency tables. Per-cell log and
# chi-square terms are snapped to scaled-integer grids before summing,
# so the fold is order-free exact integer addition (log2's 1-ulp
# engine differences vanish into the grid — the doc_perplexity
# discipline); margins and totals derive from the contingency table
# (category-domain-sized) and everything after the first groupBy is
# broadcast-sized.
MI_SCALE = 10**9
CHI2_SCALE = 10**6
MI_PAIRS = [
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderstatus", "o_orderpriority"),
]


def _mi_oracle_one(tbl: str, x: str, y: str) -> str:
    return f"""SELECT '{tbl}.{x}' AS col_x, '{tbl}.{y}' AS col_y,
           CAST(n AS BIGINT) AS n,
           CAST(n_cells AS BIGINT) AS n_cells,
           round(CAST(mi_s AS DOUBLE) / {MI_SCALE} / n, 6) AS mi_bits,
           round(CAST(chi_s AS DOUBLE) / {CHI2_SCALE}, 4) AS chi2
    FROM (
      SELECT sum(c) AS n, count(*) AS n_cells,
             sum(c * CAST(round(log2(CAST(c * tot AS DOUBLE)
                                     / CAST(cx * cy AS DOUBLE))
                                * {MI_SCALE}) AS BIGINT)) AS mi_s,
             sum(CAST(round(
                   (c - CAST(cx * cy AS DOUBLE) / tot)
                 * (c - CAST(cx * cy AS DOUBLE) / tot)
                 / (CAST(cx * cy AS DOUBLE) / tot) * {CHI2_SCALE})
               AS BIGINT)) AS chi_s
      FROM (
        SELECT {x} AS x, {y} AS y, count(*) AS c FROM {tbl} GROUP BY 1, 2
      ) cells
      JOIN (SELECT {x} AS x, count(*) AS cx FROM {tbl} GROUP BY 1) mx USING (x)
      JOIN (SELECT {y} AS y, count(*) AS cy FROM {tbl} GROUP BY 1) my USING (y)
      CROSS JOIN (SELECT count(*) AS tot FROM {tbl})
    )"""


@register(
    "mutual_info_pairs",
    oracle="\nUNION ALL\n".join(_mi_oracle_one(t, x, y) for t, x, y in MI_PAIRS),
    doc="Mutual information (bits) + chi-square for two categorical "
    "column pairs — the dependence profile for categorical features "
    "(the sibling of corr_matrix_lineitem for numerics). One groupBy "
    "per pair builds the contingency table; margins and totals derive "
    "FROM that table and join back broadcast, so the corpus is "
    "scanned once per pair. Per-cell log/chi terms snap to scaled "
    "integer grids before summation — order-free and hash-exact "
    "despite libm log2 differing from the JVM's by 1 ulp on some "
    "inputs.",
    tags=["stats"],
)
def mutual_info_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, x, y in MI_PAIRS:
        t = table(spark, sf_dir, tbl)
        cells = t.groupBy(
            F.col(x).alias("x"), F.col(y).alias("y")
        ).agg(F.count("*").alias("c"))
        mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
        my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
        tot = cells.agg(F.sum("c").alias("tot"))
        joined = (
            cells.join(F.broadcast(mx), "x")
            .join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(tot))
        )
        e = (F.col("cx") * F.col("cy")).cast("double") / F.col("tot")
        mi_term = F.col("c") * F.round(
            F.log2(
                (F.col("c") * F.col("tot")).cast("double")
                / (F.col("cx") * F.col("cy")).cast("double")
            )
            * MI_SCALE
        ).cast("long")
        chi_term = F.round(
            (F.col("c") - e) * (F.col("c") - e) / e * CHI2_SCALE
        ).cast("long")
        agg = joined.agg(
            F.sum("c").alias("n"),
            F.count("*").alias("n_cells"),
            F.sum(mi_term).alias("mi_s"),
            F.sum(chi_term).alias("chi_s"),
        )
        outs.append(
            agg.select(
                F.lit(f"{tbl}.{x}").alias("col_x"),
                F.lit(f"{tbl}.{y}").alias("col_y"),
                F.col("n").cast("long").alias("n"),
                F.col("n_cells").cast("long").alias("n_cells"),
                F.round(
                    F.col("mi_s").cast("double") / MI_SCALE / F.col("n"), 6
                ).alias("mi_bits"),
                F.round(
                    F.col("chi_s").cast("double") / CHI2_SCALE, 4
                ).alias("chi2"),
            )
        )
    return outs[0].unionAll(outs[1])
