"""Bloom semi-join reduction properties the oracle can't see: the probe
prunes a large fraction of the fact side, yet never drops a true match
(no false negatives — the losslessness the exact join relies on)."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import bloom
from mapreduce_framework_in_go_spark.sources.tables import table


def test_bloom_probe_prunes_without_false_negatives(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > bloom.PRICE_MIN
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    bf = bloom.bloom_build(orders.select("o_orderkey"), "o_orderkey")
    survivors = bloom.bloom_filtered(li, "l_orderkey", bf)

    n_total = li.count()
    n_surv = survivors.count()
    n_true = li.join(
        orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "semi"
    ).count()

    assert n_true <= n_surv  # superset of the true matches
    assert n_surv < 0.5 * n_total  # the prune actually prunes
    # no false negatives key-by-key: every true key passes the filter
    missed = (
        li.join(orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "semi")
        .exceptAll(survivors)
        .count()
    )
    assert missed == 0


def test_bloom_filter_is_kilobytes(spark, sf_dir):
    """The broadcast payload is <= M/64 words — KBs, not a hash relation."""
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > bloom.PRICE_MIN
    )
    bf = bloom.bloom_build(orders.select("o_orderkey"), "o_orderkey")
    row = bf.collect()[0]
    assert len(row["bf"]) <= bloom.BLOOM_M // 64
