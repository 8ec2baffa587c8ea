"""Semantics tests for the time-series regularization operator
(operators/timeseries.py) beyond the generic oracle-parity gate."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators.timeseries import resample_gapfill


def test_gapfill_grid_is_contiguous_and_filled(spark, sf_dir):
    out = resample_gapfill(spark, sf_dir).persist()
    try:
        # Per user the hourly grid is contiguous: span hours == row count.
        spans = (
            out.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.min("hour").alias("h0"),
                F.max("hour").alias("h1"),
            )
            .withColumn(
                "expect",
                (
                    F.expr(
                        "timestampdiff(HOUR, to_timestamp_ntz(h0), to_timestamp_ntz(h1))"
                    )
                    + 1
                ),
            )
        )
        bad = spans.where(F.col("n") != F.col("expect")).count()
        assert bad == 0

        # Grid endpoints are observations, never gaps.
        ends = out.join(
            spans.select("user_id", "h0", "h1"),
            "user_id",
        ).where(
            ((F.col("hour") == F.col("h0")) | (F.col("hour") == F.col("h1")))
            & F.col("is_gap")
        )
        assert ends.count() == 0

        # Gap rows never introduce a new value: each gap's ffill value
        # equals the previous grid row's ffill value.
        w = "(PARTITION BY user_id ORDER BY hour)"
        chk = (
            out.selectExpr(
                "user_id",
                "hour",
                "is_gap",
                "value_ffill",
                f"lag(value_ffill) OVER {w} AS prev_v",
            )
            .where("is_gap AND value_ffill IS DISTINCT FROM prev_v")
            .count()
        )
        assert chk == 0

        # Gap rows report zero events; observation rows at least one.
        assert out.where("is_gap AND n_events != 0").count() == 0
        assert out.where("NOT is_gap AND n_events < 1").count() == 0
    finally:
        out.unpersist()
