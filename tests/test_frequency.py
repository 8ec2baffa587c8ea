"""Misra-Gries heavy-hitters properties the oracle can't see:
bounded summary size under eviction pressure, and lossless recall of
the heavy set even when the sketch is actively evicting (sf0.001 is too
small to trigger eviction, so these run on a skewed synthetic stream)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import frequency


def _skewed_batches(n_heavy=3, heavy_freq=400, n_tail=500, tail_freq=2, batch=256):
    """Stream of shingle batches: a few heavy keys + a long tail."""
    vals = []
    for h in range(n_heavy):
        vals += [f"heavy_{h}"] * heavy_freq
    for t in range(n_tail):
        vals += [f"tail_{t}"] * tail_freq
    # deterministic interleave so heavies are spread across batches
    vals.sort(key=lambda s: hash(s) % 7919)
    return [
        pd.DataFrame({"s": vals[i : i + batch]}) for i in range(0, len(vals), batch)
    ], len(vals)


def test_mg_summary_bounded_and_retains_heavies():
    batches, n = _skewed_batches()
    cap = 50  # force heavy eviction: 503 distinct keys, 50 counters
    (out,) = list(frequency._make_mg_candidates(cap)(iter(batches)))
    assert len(out) <= cap
    # every key with freq > n/(cap+1) must survive (MG guarantee)
    thresh = n / (cap + 1)
    assert 400 > thresh  # fixture actually exercises the guarantee
    survivors = set(out["s"])
    assert {f"heavy_{h}" for h in range(3)} <= survivors


def test_pipeline_lossless_under_eviction(spark, monkeypatch):
    """End-to-end on a synthetic skewed corpus with a tiny capacity that
    still satisfies cap+1 > 1/frac: the two-phase output must equal the
    exact full-shuffle answer bit-for-bit."""
    frac = 0.05
    cap = 40  # cap+1 = 41 > 1/frac = 20 (the lossless-recall condition)
    monkeypatch.setattr(frequency, "MG_CAPACITY", cap)
    monkeypatch.setattr(frequency, "BOILER_FRAC", frac)

    # ~6800 occurrences, 203 distinct: 3 heavies above 5%, tail below
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma " * 2),  # shared boilerplate, every doc
            F.lit("tail"),
            # letters only: the tokenizer drops digit runs
            F.translate(F.col("id").cast("string"), "0123456789", "abcdefghij"),
            F.lit(" one two three"),
        ).alias("text"),
    )

    def fake_table(_spark, _sf_dir, name):
        assert name == "documents"
        return docs

    monkeypatch.setattr(frequency, "table", fake_table)
    got = {
        (r["shingle"], r["n_occ"], r["n_docs"])
        for r in frequency.boilerplate_ngrams(spark, "unused").collect()
    }

    occ = frequency._shingle_occurrences(docs)
    total = occ.count()
    import math

    exact = {
        (r["s"], r["n_occ"], r["n_docs"])
        for r in occ.groupBy("s")
        .agg(
            F.count("*").alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occ") >= math.ceil(frac * total))
        .collect()
    }
    assert got == exact
    assert len(exact) > 0  # fixture has real heavies
    # and the sketch was under genuine eviction pressure
    assert occ.select("s").distinct().count() > cap
