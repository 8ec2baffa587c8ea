"""Streaming corpus ingestion gate — the pipeline's map-only front
(quality gate, language gate, benchmark decontamination) applied to
documents AS THEY ARRIVE, before anything hits storage.

The batch pipeline (operators/pipeline.py, operators/training_prep.py)
and this stream run the SAME expressions: the gates are pure column
work, and the decontamination check is a broadcast of the eval suite's
n-gram set folded into an ``array_intersect`` per document — stateless,
so the stream needs no watermark, no state store, and no shuffle for
any of the three gates. Only the downstream dedup stage
(streaming/dedup_stream.py) carries state.

Scale notes (100 TB/day ingestion): per-microbatch cost is scan +
map — the gate adds zero exchanges to the stream plan. The eval n-gram
array is megabytes (an eval suite, not a corpus) and is re-broadcast
per batch by the stream-static join machinery; at cluster scale you
would pin it with a persisted broadcast variable, same dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_col, tokens_col
from ..operators.pipeline import flag_frame
from ..operators.training_prep import DECON_NGRAM, EVAL_MOD


def eval_ngram_set(docs: DataFrame) -> DataFrame:
    """One-row frame holding the eval split's distinct n-gram array —
    the static side of the stream-static decontamination join."""
    return (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .select(
            F.explode(
                F.array_distinct(
                    shingles_col(tokens_col("text"), DECON_NGRAM)
                )
            ).alias("s")
        )
        .distinct()
        .agg(F.collect_list("s").alias("eval_ngrams"))
    )


def ingest_gate_stream(docs: DataFrame, eval_ngrams: DataFrame) -> DataFrame:
    """Filter a document stream to gate survivors: quality pass,
    language pass, not part of the eval split, and zero n-gram overlap
    with the (static, broadcast) eval set. Emits (doc_id, source,
    n_tokens) — append-mode safe, no state."""
    flags = flag_frame(docs)
    hits = F.size(
        F.array_intersect(
            F.array_distinct(shingles_col(tokens_col("text"), DECON_NGRAM)),
            F.col("eval_ngrams"),
        )
    )
    return (
        flags.join(F.broadcast(eval_ngrams))
        .where(
            F.col("pass_q")
            & F.col("pass_lang")
            & (F.col("doc_id") % EVAL_MOD != 0)
            & (hits == 0)
        )
        .select("doc_id", "source", "n_tokens")
    )
