"""PQ encoding invariants beyond the oracle parity gate."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators.pq import (
    PQ_M,
    PQ_TOP_K,
    _codes,
    _pq_frames,
    ann_pq,
)


def test_pq_codes_cover_every_vector_subspace(spark, sf_dir):
    emb, seeds_sub = _pq_frames(spark, sf_dir)
    codes = _codes(emb, seeds_sub).persist()
    try:
        n_vec = emb.count()
        assert codes.count() == n_vec * PQ_M
        # every (vec, m) exactly once; every code a real seed id
        assert codes.select("vec_id", "m").distinct().count() == n_vec * PQ_M
        valid = seeds_sub.select(
            F.col("seed_id").alias("code"), "m"
        ).distinct()
        assert codes.join(valid, ["code", "m"], "leftanti").count() == 0
        # a seed encodes to ITSELF in every subspace (distance 0)
        self_codes = codes.join(
            valid.select(F.col("code").alias("vec_id")).distinct(), "vec_id"
        )
        assert (
            self_codes.where(F.col("code") != F.col("vec_id")).count() == 0
        )
    finally:
        codes.unpersist()


def test_pq_topk_shape(spark, sf_dir):
    out = ann_pq(spark, sf_dir).persist()
    try:
        assert out.where("query_id = neighbor_id").count() == 0
        per_q = out.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("rank").alias("mx")
        )
        assert per_q.where(f"n != {PQ_TOP_K} OR mx != {PQ_TOP_K}").count() == 0
    finally:
        out.unpersist()
