"""Output-layout tests: file sizing and sort-clustered min/max pruning."""

import glob

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.sources.layout import (
    write_clustered,
    write_sized,
)


def test_write_sized_controls_file_count(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    total = li.count()
    out = str(tmp_path / "sized")
    write_sized(li, out, rows_per_file=1000, approx_total=total)
    files = glob.glob(f"{out}/*.parquet")
    expected = max(1, total // 1000)
    assert expected <= len(files) <= expected * 2 + 1, (len(files), expected)
    assert spark.read.parquet(out).count() == total


def test_write_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    out = str(tmp_path / "clustered")
    write_clustered(li, out, "l_orderkey", n_files=8)
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
            .collect()[0]
        )
        if r["lo"] is not None:
            ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
