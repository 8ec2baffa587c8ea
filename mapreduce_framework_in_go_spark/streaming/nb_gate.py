"""Streaming Naive Bayes gate — classifier serving as a stream.

The batch half (``operators/classifier``) trains the hashed-NB model;
this scores documents AS THEY ARRIVE against that frozen model — the
production ingest shape for a classifier-gated pipeline (CCNet-style:
every crawled page is scored on the way in, not in a later batch).

Plumbing: the (C x B)-bounded likelihood table is pivoted to one row
per bucket carrying the class-ordered score array (``sll_arr``), and
joined stream-static broadcast onto the token stream — zero shuffle
per token. The ONLY stateful operator is a single per-(doc, class-sum)
aggregation whose state is C+1 longs per in-flight document; the
argmax is a stateless post-aggregation projection (array_sort with the
(score DESC, class ASC) comparator — exactly the batch tie-break), so
streaming never needs a second aggregation level or a window.

Scale (100 TB ingest): model broadcast is |C|x1024 longs; per-doc
state is bounded and evicted with the doc's group; the verdict stream
is one row per arriving document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_long32, tokens_col
from ..operators.classifier import NB_BUCKETS, NB_FOLD


def doc_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the documents parquet; schema probed from the
    static footer so generator drift cannot desynchronize the stream
    from the batch oracle."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "*")
    )


def lik_wide(lik: DataFrame) -> DataFrame:
    """Pivot lik(c, b, sll) to (b, sll_arr): one row per bucket, scores
    ordered by class name — the broadcastable serving layout."""
    return lik.groupBy("b").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("c", "sll"))),
            lambda s: s["sll"],
        ).alias("sll_arr")
    )


def _cmp(l: Column, r: Column) -> Column:
    """(score DESC, class ASC) — the batch argmax tie-break."""
    return (
        F.when(l["score"] > r["score"], F.lit(-1))
        .when(l["score"] < r["score"], F.lit(1))
        .when(l["c"] < r["c"], F.lit(-1))
        .when(l["c"] > r["c"], F.lit(1))
        .otherwise(F.lit(0))
    )


def nb_gate_stream(
    docs: DataFrame,
    model: DataFrame,
    classes: list[str],
    priors: dict[str, int],
) -> DataFrame:
    """(doc_id, true_source, pred_source, n_tokens) verdicts for the
    holdout slice of a document stream, scored against the frozen
    broadcast ``model`` (= :func:`lik_wide` of the batch likelihoods).

    Documents with zero tokens never produce a verdict (no token rows
    reach the aggregation) — mirrored in the oracle's token-count join.
    """
    tok = (
        docs.where(F.col("doc_id") % NB_FOLD == 0)
        .select(
            "doc_id",
            F.col("source").alias("true_source"),
            F.explode(tokens_col("text")).alias("w"),
        )
        .select(
            "doc_id",
            "true_source",
            (md5_long32(F.col("w")) % NB_BUCKETS).alias("b"),
        )
    )
    joined = tok.join(F.broadcast(model), "b")
    sums = [
        F.sum(F.element_at(F.col("sll_arr"), i + 1)).alias(f"s{i}")
        for i in range(len(classes))
    ]
    per_doc = joined.groupBy("doc_id", "true_source").agg(
        F.count("*").alias("n_tokens"), *sums
    )
    scored_arr = F.array(
        *[
            F.struct(
                (F.col(f"s{i}") + F.lit(priors[c])).alias("score"),
                F.lit(c).alias("c"),
            )
            for i, c in enumerate(classes)
        ]
    )
    return per_doc.select(
        "doc_id",
        "true_source",
        F.element_at(F.array_sort(scored_arr, _cmp), 1)["c"].alias(
            "pred_source"
        ),
        "n_tokens",
    )
