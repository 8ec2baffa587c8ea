"""Per-slot cache isolation — the recurring review-finding class.

The rule (CLAUDE.md): a one-generation persist cache is PER FAMILY. A
driver may build several query frames before collecting any; if family
B's build evicts family A's slot, A's still-unexecuted persisted frame
silently recomputes (winnow/pipeline/embedding-IVF all had this at some
point). These tests pin the contract mechanically: build a frame in
one family, trigger the OTHER family's eviction path, and assert the
first frame is still marked persisted (eviction would reset its
storage level to NONE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import dedup, pipeline, textops
from mapreduce_framework_in_go_spark.operators.similarity import (
    _evict_previous_generation as sim_evict,
)
from mapreduce_framework_in_go_spark.sources.tables import table


def test_winnow_frames_survive_dedup_eviction(spark, sf_dir):
    _cand, _pairs, sh = textops._winnow_pair_frames(spark, sf_dir)
    assert sh.storageLevel.useMemory
    dedup._evict_previous_generation()  # any dedup-family build runs this
    assert sh.storageLevel.useMemory, (
        "winnow shingle frame evicted by dedup's generation — per-slot "
        "rule violated"
    )


def test_pipeline_frames_survive_dedup_eviction(spark, sf_dir):
    pipeline._level_frame(table(spark, sf_dir, "documents"))
    frames = list(pipeline._PIPELINE_GENERATION)
    assert frames and all(f.storageLevel.useMemory for f in frames)
    dedup._evict_previous_generation()
    assert all(f.storageLevel.useMemory for f in frames), (
        "pipeline flags/shingles evicted by dedup's generation"
    )


def test_emb_ivf_assignment_survives_similarity_eviction(spark, sf_dir):
    df = dedup.dedup_embedding_ivf(spark, sf_dir)
    frames = list(dedup._EMB_IVF_GENERATION)
    assert frames and all(f.storageLevel.useMemory for f in frames)
    sim_evict()  # any similarity-family build runs this
    assert all(f.storageLevel.useMemory for f in frames), (
        "embedding-IVF assignment evicted by similarity's generation"
    )
    # and the frame still executes correctly after the foreign eviction
    assert df.where(F.col("cosine").isNotNull()).count() >= 0
