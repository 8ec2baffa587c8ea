"""IVM algebra tests beyond the registry parity gate: the merge must
hold under ANY split, including fully-overlapping distinct slices."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators.ivm import HLL_LGK


def test_hll_union_equals_direct_under_total_overlap(spark):
    # Every user appears in BOTH slices — additive merge would double
    # count; register-max merge must not.
    rows = [(u, s) for u in range(200) for s in (0, 1)]
    df = spark.createDataFrame(rows, "user_id long, slice int")
    got = (
        df.groupBy()
        .agg(
            F.expr(
                f"hll_sketch_agg(CASE WHEN slice=0 THEN user_id END, {HLL_LGK})"
            ).alias("a"),
            F.expr(
                f"hll_sketch_agg(CASE WHEN slice=1 THEN user_id END, {HLL_LGK})"
            ).alias("b"),
            F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("all"),
        )
        .selectExpr(
            "hll_sketch_estimate(hll_union(a, b)) AS merged",
            "hll_sketch_estimate(all) AS direct",
        )
        .collect()[0]
    )
    assert got["merged"] == got["direct"]
    assert abs(got["merged"] - 200) <= 10


def test_partial_state_merge_is_split_invariant(spark, sf_dir):
    # Two DIFFERENT base/delta splits of lineitem must merge to the
    # same state — the algebra is independent of how history was
    # batched, which is what lets a pipeline re-batch freely.
    from mapreduce_framework_in_go_spark.operators.ivm import (
        _partial_state,
        _split,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def merged(parts):
        st = parts[0]
        for p in parts[1:]:
            st = st.unionByName(p)
        return (
            st.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sq100").alias("sq100"),
                F.sum("sp100").alias("sp100"),
                F.min("min_ship").alias("min_ship"),
                F.max("max_ship").alias("max_ship"),
            )
            .orderBy("l_returnflag", "l_linestatus")
            .collect()
        )

    by_tens = merged(
        [_partial_state(_split(li, False)), _partial_state(_split(li, True))]
    )
    thirds = merged(
        [
            _partial_state(li.where(F.col("l_orderkey") % 3 == k))
            for k in range(3)
        ]
    )
    assert by_tens == thirds
