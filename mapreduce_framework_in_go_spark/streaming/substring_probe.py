"""Streaming duplicated-substring probe at ingest — the crawl-delta
twin of ``operators/spans.py``: as delta documents ARRIVE, each is
scanned for token regions already present (as W-gram windows) in the
standing base corpus, and a per-document scrub ledger row is emitted.

Dataflow (stream-static, the stream never joins itself):

1. per-row windowing: tokens + positioned W-grams are pure column work
   on the arriving document (``posexplode_outer`` keeps short docs so
   their zero-ledger rows still emit);
2. membership probe: gram rows LEFT-join the base corpus's DISTINCT
   gram set (static, build-once, bucketable by gram on a cluster);
3. ledger fold: one ``applyInPandasWithState`` group per delta doc
   (its gram rows all derive from one input row, so they share a
   microbatch) merges flagged positions into maximal islands —
   the batch gaps-and-islands in one pandas pass — and emits
   (n_tokens, dup_tokens, n_spans, dup_frac).

Scale notes: per-microbatch cost is the delta's windowing (map-only) +
one gram-keyed join against the bucketed base set + a fold whose state
is one in-flight group per delta doc. Nothing scales with the base
corpus except the (pruned) membership join. The base set is the
standing artifact a recurring crawl maintains; the batch spans pass
rebuilds it when the base itself changes.

Oracle: the registered query's SQL computes the identical ledger in
batch (delta split vs base split of ``documents``), so the stream
provably converges to the batch answer
(operators/streaming_queries.py:stream_substring_probe).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import shingles_col, tokens_col
from ..operators.spans import SPAN_W

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("dup_tokens", T.LongType()),
        T.StructField("n_spans", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("done", T.IntegerType())])


def base_gram_set(base_docs: DataFrame) -> DataFrame:
    """(g): the standing corpus's distinct W-gram set — the build-once
    membership artifact the stream probes."""
    return base_docs.select(
        F.explode(
            F.array_distinct(shingles_col(tokens_col("text"), SPAN_W))
        ).alias("g")
    ).distinct()


def _ledger(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    # Contract: a delta doc's gram rows arrive in exactly ONE microbatch
    # (they all derive from one input row via explode). The ledger fold
    # below is only correct under that assumption — a doc split across
    # microbatches would silently emit two partial ledgers in update
    # mode — so assert it: mark the group done and fail loudly if the
    # same doc ever fires twice.
    if state.exists:
        raise RuntimeError(
            f"substring_probe: doc {key[0]!r} arrived in a second "
            "microbatch; the single-batch-per-doc source contract is "
            "violated and the ledger would be partial"
        )
    state.update((1,))
    chunks = list(pdf_iter)
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    n_tokens = int(pdf["n_tokens"].iloc[0])
    flagged = sorted(
        int(p) + 1 for p in pdf.loc[pdf["hit"].notna(), "pos0"]
    )
    spans = []
    for p in flagged:
        # extend while coverage stays contiguous (gap <= W: overlap or
        # touch), matching the batch island rule — break only at a hole
        if spans and p - spans[-1][1] <= SPAN_W:
            spans[-1][1] = p
        else:
            spans.append([p, p])
    dup_tokens = sum(e + SPAN_W - 1 - s + 1 for s, e in spans)
    # dup_frac is NOT computed here: Python round() is half-to-even
    # while the oracle (and Spark F.round) round half away from zero —
    # the caller derives it JVM-side from the emitted integers.
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "n_tokens": [n_tokens],
            "dup_tokens": [dup_tokens],
            "n_spans": [len(spans)],
        }
    )


def substring_probe_stream(
    delta_stream: DataFrame, base_grams: DataFrame
) -> DataFrame:
    """Per arriving delta doc, the scrub ledger against the static base
    gram set: (doc_id, n_tokens, dup_tokens, n_spans, dup_frac)."""
    toks = delta_stream.select(
        "doc_id", tokens_col("text").alias("toks")
    ).where(F.size("toks") > 0)
    grams = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.posexplode_outer(shingles_col(F.col("toks"), SPAN_W)).alias(
            "pos0", "g"
        ),
    )
    probed = grams.join(
        base_grams.withColumn("hit", F.lit(1)), "g", "left"
    ).select("doc_id", "n_tokens", "pos0", "hit")
    folded = probed.groupBy("doc_id").applyInPandasWithState(
        _ledger,
        outputStructType=LEDGER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    # JVM-side rounding (stateless projection on the stream): F.round
    # matches the oracle's half-away-from-zero ties, Python's doesn't
    return folded.withColumn(
        "dup_frac", F.round(F.col("dup_tokens") / F.col("n_tokens"), 6)
    )
