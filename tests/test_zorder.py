"""Z-order layout: the measured skipping win, at query level (bucket
extents) and on real parquet files (footer min/max stats)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators.zorder import zorder_layout
from mapreduce_framework_in_go_spark.sources.layout import (
    write_clustered,
    write_zordered,
)


def test_zorder_prunes_y_probe_linear_cannot(spark, sf_dir):
    out = zorder_layout(spark, sf_dir).persist()
    try:
        hits = {
            r["layout"]: (r["y"], r["n"])
            for r in out.groupBy("layout")
            .agg(
                F.sum(F.col("hits_y_probe").cast("int")).alias("y"),
                F.count("*").alias("n"),
            )
            .collect()
        }
        z_y, z_n = hits["zorder"]
        l_y, l_n = hits["linear"]
        # custkey-sorted layout cannot prune a date predicate: every
        # bucket's date extent spans the probe band
        assert l_y == l_n
        # the z-layout prunes a real fraction of buckets on that axis
        assert z_y < l_y
        assert z_y <= z_n * 3 // 4
    finally:
        out.unpersist()


def test_write_zordered_files_prune_both_dimensions(spark, sf_dir, tmp_path):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr(
                "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " o_orderdate)"
            ).alias("day"),
        )
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    write_zordered(o, zdir, "o_custkey", "day", n_files=8)
    write_clustered(o, ldir, "o_custkey", n_files=8)

    def file_extents(d):
        exts = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = {"o_custkey": None, "day": None}
            hi = {"o_custkey": None, "day": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema
                    if name in lo and c.statistics is not None:
                        mn, mx = c.statistics.min, c.statistics.max
                        lo[name] = mn if lo[name] is None else min(lo[name], mn)
                        hi[name] = mx if hi[name] is None else max(hi[name], mx)
            exts.append((lo, hi))
        return exts

    # probe: a one-eighth band in the middle of the day range
    dmin, dmax = o.agg(F.min("day"), F.max("day")).collect()[0]
    band_lo = dmin + (dmax - dmin) * 4 // 8
    band_hi = dmin + (dmax - dmin) * 5 // 8

    def files_scanned(exts):
        return sum(
            1
            for lo, hi in exts
            if lo["day"] <= band_hi and hi["day"] >= band_lo
        )

    z_exts, l_exts = file_extents(zdir), file_extents(ldir)
    assert len(z_exts) >= 4 and len(l_exts) >= 4
    # custkey-clustered files all span the full day range -> no pruning
    assert files_scanned(l_exts) == len(l_exts)
    # z-ordered files genuinely skip for the same predicate
    assert files_scanned(z_exts) < len(z_exts)
    # and the z-layout still keeps custkey extents partial (2-D balance):
    # no single file spans the full custkey range AND the full day range
    full_span = [
        (lo, hi)
        for lo, hi in z_exts
        if lo["o_custkey"] == 0 and lo["day"] == dmin and hi["day"] == dmax
    ]
    ck_max = o.agg(F.max("o_custkey")).collect()[0][0]
    assert not any(hi["o_custkey"] == ck_max for lo, hi in full_span)
