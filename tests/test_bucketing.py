"""Bucketed co-located join: the write-time shuffle elimination the
100 TB fact-fact join depends on."""

import re

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.plans import formatted_plan
from mapreduce_framework_in_go_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    old_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        ).withColumnRenamed("l_orderkey", "o_orderkey")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_bucketed(li, "li_bucketed", "o_orderkey")
        write_bucketed(o, "o_bucketed", "o_orderkey")

        joined = colocated_join(spark, "li_bucketed", "o_bucketed", "o_orderkey")
        plan = formatted_plan(joined)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan

        # and the result is right: every lineitem found its order
        n = joined.count()
        assert n == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

        # the unbucketed twin shuffles BOTH sides — the cost bucketing buys out
        plain = li.join(o, "o_orderkey")
        plain_plan = formatted_plan(plain)
        assert len(re.findall(r"\(\d+\) Exchange", plain_plan)) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_threshold)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """Date-partitioned parquet + a date filter => PartitionFilters in
    the scan, not a full read."""
    from mapreduce_framework_in_go_spark.sources.tables import table

    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    (
        ev.withColumn("day", F.expr("CAST(datediff(ts, DATE '1970-01-01') AS INT)"))
        .write.partitionBy("day")
        .parquet(out)
    )
    read = spark.read.parquet(out).where(F.col("day") == 19723)
    plan = formatted_plan(read)
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "day" in m[0], plan
