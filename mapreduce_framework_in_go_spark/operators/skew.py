"""Skew handling: salted two-phase aggregation for hot keys.

The reference's crash/nocrash probe funnels every row into 4 keys
(``mrapps/nocrash.go:26-35``) — the pathological hot-key shape. A plain
``groupBy(key).collect_list`` sends every row of a hot key through one
reducer task; at 100 TB that task is the job. The salted form:

  stage 1: groupBy(key, salt) — salt = hash(value) % N spreads each hot
           key over N reducers; each emits a SORTED value array + count.
  stage 2: groupBy(key) over N rows per key — flatten the N pre-sorted
           arrays, sort, join.

The stage-1 shuffle is the one that carries all rows, and it is now
uniform. Stage 2 moves N array-rows per key. The final per-key sort
still holds one key's values in one task — that is inherent to the
OUTPUT ("all values of the key, globally sorted, in one string", the
same bound the reference's 500 B snapshot test acknowledges) — but it
runs on pre-aggregated arrays, not on the raw shuffle stream, so fetch
skew and per-row processing skew are gone.

Output is bit-identical to the unsalted aggregate (same oracle SQL);
tests assert equality and that the plan shows the two-exchange shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

N_SALTS = 16


def salted_sorted_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = N_SALTS,
    sep: str = " ",
) -> DataFrame:
    """Two-phase sorted string_agg: (key, n_values, joined), identical to
    ``groupBy(key).agg(count, array_join(sort_array(collect_list)))`` but
    with the heavy shuffle spread over ``n_salts`` buckets per key."""
    stage1 = (
        df.select(
            F.col(key).alias("key"),
            F.col(value).alias("value"),
            F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("salt"),
        )
        .groupBy("key", "salt")
        .agg(
            F.count("*").alias("n_part"),
            F.sort_array(F.collect_list("value")).alias("vals_part"),
        )
    )
    return stage1.groupBy("key").agg(
        F.sum("n_part").alias("n_values"),
        F.array_join(
            F.array_sort(F.flatten(F.collect_list("vals_part"))), sep
        ).alias("joined"),
    )


@register(
    "mr_crash_shape_salted",
    oracle="""
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_values,
           string_agg(value, ' ' ORDER BY value) AS joined
    FROM (
      SELECT 'a' AS key, source AS value FROM documents
      UNION ALL
      SELECT 'b', CAST(length(source) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'd', 'xyzzy' FROM documents
    )
    GROUP BY key
    """,
    doc="The crash-probe aggregate (4 hot keys carrying every row) "
    "executed with 16-way salting — same oracle, same output as "
    "mr_crash_shape, but the row-bearing shuffle is uniform. The "
    "pattern every unbounded-group aggregate needs at 100 TB.",
    tags=["mapreduce", "skew"],
)
def mr_crash_shape_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.expr(
            "stack(4, "
            "'a', source, "
            "'b', cast(length(source) as string), "
            "'c', cast(n_chars as string), "
            "'d', 'xyzzy') as (key, value)"
        )
    )
    return salted_sorted_agg(pairs, "key", "value")


HOT_MOD = 10  # l_orderkey % 10 < 7 => collapsed onto ONE hot key


@register(
    "salted_hot_join",
    oracle=f"""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % {HOT_MOD} < 7 THEN 0 ELSE l_orderkey END
               AS jkey,
             l_extendedprice, l_discount
      FROM lineitem
    ),
    dim AS (
      SELECT jkey, CAST(count(*) AS BIGINT) AS key_rows
      FROM fact GROUP BY jkey
    )
    SELECT CASE WHEN f.jkey = 0 THEN 'hot' ELSE 'tail' END AS key_class,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(min(d.key_rows) AS BIGINT) AS min_key_rows
    FROM fact f JOIN dim d USING (jkey)
    GROUP BY 1
    """,
    doc="Salted join on a pathologically hot key (70% of lineitem "
    "collapses onto one join key): the dimension side is REPLICATED "
    "once per salt (a 16x explode of the small side) and the fact side "
    "computes salt = hash(row) % 16, so the hot key's rows spread over "
    "16 join tasks instead of one — the replicate-and-salt dual of the "
    "two-phase salted aggregation, for when the build side is small "
    "but AQE's skew split cannot help (e.g. a shuffle hash join with "
    "an aggregation fused downstream). Output is bit-identical to the "
    "plain join the oracle runs — salting is pure repartitioning.",
    tags=["skew", "joins"],
)
def salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % HOT_MOD < 7, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("jkey"),
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).alias(
            "salt"
        ),
    )
    dim = fact.groupBy("jkey").agg(F.count("*").alias("key_rows"))
    dim_salted = dim.select(
        "jkey",
        "key_rows",
        F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)])).alias("salt"),
    )
    joined = fact.join(dim_salted, ["jkey", "salt"])
    from .relational import fsum

    return (
        joined.groupBy(
            F.when(F.col("jkey") == 0, "hot").otherwise("tail").alias("key_class")
        )
        .agg(
            F.count("*").alias("n_rows"),
            fsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
            ).alias("revenue"),
            F.min("key_rows").alias("min_key_rows"),
        )
    )
