"""DSIR semantics beyond the generic oracle parity: an independent
pure-Python model check of the weights, the selection budget, KL
sanity, and the family's cache-slot isolation."""

from __future__ import annotations

import hashlib
import math
import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import dedup, dsir


def _py_bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dsir.DSIR_BUCKETS


def _py_model(sf_dir: str):
    """Independent-implementation DSIR: plain Python re/md5/math —
    shares no code with the Spark path or the SQL oracle."""
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    ct = [0] * dsir.DSIR_BUCKETS
    cr = [0] * dsir.DSIR_BUCKETS
    doc_buckets = {}
    for row in tbl:
        # letter runs: \w minus digits/underscore == Unicode letters
        toks = re.findall(r"[^\W\d_]+", row["text"])
        bs = [_py_bucket(t) for t in toks]
        tgt = row["source"] == dsir.DSIR_TARGET
        for b in bs:
            (ct if tgt else cr)[b] += 1
        if not tgt:
            doc_buckets[row["doc_id"]] = bs
    tt, tr = sum(ct), sum(cr)
    B, S = dsir.DSIR_BUCKETS, dsir.LOG_SCALE
    slr = [
        round(math.log((ct[b] + 1) / (tt + B)) * S)
        - round(math.log((cr[b] + 1) / (tr + B)) * S)
        for b in range(B)
    ]
    weights = {
        d: sum(slr[b] for b in bs) for d, bs in doc_buckets.items()
    }
    return weights


def test_weights_match_independent_python_model(spark, sf_dir):
    expected = _py_model(sf_dir)
    rows = dsir.dsir_weights(spark, sf_dir).collect()
    got = {r.doc_id: r.w_scaled for r in rows}
    assert got == expected


def test_select_budget_and_target_exclusion(spark, sf_dir):
    rows = dsir.dsir_select(spark, sf_dir).collect()
    assert all(r.source != dsir.DSIR_TARGET for r in rows), (
        "target slice must not appear in the scored pool"
    )
    n_docs = sum(r.n_docs for r in rows)
    n_sel = sum(r.n_selected for r in rows)
    assert n_sel == math.ceil(n_docs * dsir.DSIR_SELECT_FRAC)
    assert all(0 <= r.n_selected <= r.n_docs for r in rows)


def test_divergence_row_sanity(spark, sf_dir):
    row = dsir.dsir_bucket_divergence(spark, sf_dir).collect()[0]
    expected = _py_model(sf_dir)
    # token totals cross-check the independent tokenizer
    py_raw = sum(
        len(bs) for bs in _raw_bucket_lists(sf_dir)
    )
    assert row.raw_tokens == py_raw
    assert row.n_buckets_hit <= dsir.DSIR_BUCKETS
    # smoothed-KL of genuinely different word salads is positive
    assert row.kl_nats > 0
    assert expected  # model ran


def _raw_bucket_lists(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pylist()
    for row in tbl:
        if row["source"] != dsir.DSIR_TARGET:
            yield re.findall(r"[^\W\d_]+", row["text"])


def test_dsir_frames_survive_dedup_eviction(spark, sf_dir):
    slr, w = dsir._frames(spark, sf_dir)
    assert slr.storageLevel.useMemory and w.storageLevel.useMemory
    dedup._evict_previous_generation()
    assert slr.storageLevel.useMemory and w.storageLevel.useMemory, (
        "dsir frames evicted by dedup's generation — per-slot rule violated"
    )
