"""Bounded-memory heavy hitters — boilerplate n-gram detection.

The 100 TB problem: find over-represented word n-grams (navigation
chrome, license headers, template boilerplate) across a crawl so they
can be stripped before training. The naive plan — explode every
shingle occurrence and ``GROUP BY shingle`` — shuffles one row per
occurrence (~tokens x n rows); at corpus scale that exchange dwarfs
every other stage and the reduce-side hash tables are unbounded.

The scale shape here is the classic two-phase heavy-hitters plan built
on a MERGEABLE Misra-Gries summary (Agarwal et al., "Mergeable
Summaries", PODS'12):

1. **Candidate generation, map-side, bounded memory.** Each input
   partition streams its shingle occurrences through a Misra-Gries
   summary with ``MG_CAPACITY`` counters (``mapInPandas`` — Arrow
   batches in, vectorized ``value_counts`` per batch, MG decrement on
   overflow). A partition holding ``n_p`` occurrences retains every
   shingle with local count > ``n_p / (MG_CAPACITY+1)``. By averaging,
   any shingle with GLOBAL frequency >= ``BOILER_FRAC`` of all
   occurrences exceeds that local threshold in at least one partition
   (``MG_CAPACITY + 1 > 1/BOILER_FRAC`` with 2x margin), so the union
   of per-partition summaries is a guaranteed SUPERSET of the true
   heavy set — candidate generation is LOSSLESS for the final filter,
   which is what makes the query oracle-checkable despite the sketch.
2. **Exact verification, candidates only.** A semi-join restricts the
   occurrence stream to candidate shingles (<= capacity x partitions
   rows — broadcastable), then an exact count + distinct-doc count runs
   over that residue. The final filter ``n_occ >= ceil(BOILER_FRAC *
   total)`` makes the output independent of which extra candidates the
   sketch happened to retain: output == the exact SQL answer, always.

Shuffle inventory: candidates (bounded, broadcast), the 1-row total
(broadcast), and one groupBy over candidate occurrences only. The full
occurrence stream is never exchanged.

Reference scope: the reference's wc/indexer apps (``mrapps/wc.go``,
``mrapps/indexer.go``) count exact word frequencies via full shuffle;
this is the bounded-memory sibling a corpus-scale pipeline needs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_col, tokens_col
from ..registry import register
from ..sources.tables import table

BOILER_N = 3  # word n-gram width
BOILER_FRAC = 0.0002  # heavy = >= 0.02% of all shingle occurrences
# Lossless-recall condition: MG_CAPACITY + 1 > 1 / BOILER_FRAC (=5000).
# 10k counters gives 2x margin and is ~1 MB per partition: bounded.
MG_CAPACITY = 10_000


def _make_mg_candidates(capacity: int):
    """Factory for the per-partition Misra-Gries summarizer.

    Returned as a NESTED function so cloudpickle ships it by value —
    the grading driver loads ``__spark_entry__`` from an arbitrary cwd,
    and executor Python workers cannot import this package by name.

    Per Arrow batch: exact ``value_counts`` (itself an MG summary with
    infinite capacity), merged into the running summary by counter
    addition; on overflow subtract the (capacity+1)-th largest count
    from every counter and drop the non-positive ones — the standard
    mergeable-summaries reduction, which keeps <= capacity counters and
    bounds the total decrement any key absorbs by n_p/(capacity+1).
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for s, c in pdf["s"].value_counts().items():
                counts[s] = counts.get(s, 0) + int(c)
            if len(counts) > capacity:
                vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
                # (capacity+1)-th largest value: at most `capacity` counters
                # are strictly greater, so subtract-and-drop keeps <= capacity
                d = int(np.partition(vals, len(vals) - capacity - 1)[len(vals) - capacity - 1])
                counts = {k: v - d for k, v in counts.items() if v > d}
        yield pd.DataFrame({"s": list(counts.keys())})

    return mg


def _shingle_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, s): every 3-gram occurrence (NOT distinct — frequency
    semantics), exploded map-side from the JVM-built shingle array."""
    return docs.select(
        "doc_id",
        F.explode(shingles_col(tokens_col("text"), BOILER_N)).alias("s"),
    )


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[\\p{{L}}]+') AS toks
      FROM documents
    ),
    occ AS (
      SELECT doc_id, array_to_string(toks[i:i+{BOILER_N - 1}], ' ') AS s
      FROM toks, unnest(range(1, len(toks) - {BOILER_N - 2})) u(i)
      WHERE len(toks) >= {BOILER_N}
    ),
    tot AS (SELECT count(*) AS n FROM occ)
    SELECT s AS shingle,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM occ, tot
    GROUP BY s, tot.n
    HAVING count(*) >= ceil({BOILER_FRAC} * tot.n)
    """,
    doc=f"Boilerplate phrase detection: word {BOILER_N}-grams occurring "
    f"in >= {BOILER_FRAC:.2%} of all shingle occurrences, found via "
    f"per-partition Misra-Gries summaries ({MG_CAPACITY} counters, "
    "bounded memory, lossless recall at this threshold) with exact "
    "counting restricted to the candidate residue. Output is the exact "
    "heavy set — identical to the full-shuffle SQL — but the full "
    "occurrence stream is never exchanged.",
    tags=["sketches", "text"],
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = _shingle_occurrences(docs)
    candidates = (
        occ.select("s")
        .mapInPandas(_make_mg_candidates(MG_CAPACITY), schema="s string")
        .distinct()
    )
    # the occurrence TOTAL needs no shingle strings at all — a doc with
    # t >= N tokens contributes exactly t-N+1 occurrences — so it rides
    # a map-only token-count sum instead of a third full explode pass
    # (r12: the MG pass and the candidate-restricted count are the only
    # two shingle builds left)
    total = docs.agg(
        F.sum(
            F.greatest(
                F.size(tokens_col("text")) - F.lit(BOILER_N - 1), F.lit(0)
            )
        ).alias("_total")
    )
    return (
        occ.join(F.broadcast(candidates), "s")
        .groupBy("s")
        .agg(
            F.count("*").alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occ") >= F.ceil(F.lit(BOILER_FRAC) * F.col("_total")))
        .select(F.col("s").alias("shingle"), "n_occ", "n_docs")
    )
