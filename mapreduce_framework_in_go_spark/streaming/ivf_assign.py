"""Streaming IVF cell assignment — index maintenance as a stream.

The batch half (``operators/similarity.ann_ivf_incremental``) assigns a
delta slice to a frozen base-trained index and reports the occupancy
ledger; this is the same operation applied to vectors AS THEY ARRIVE:
each new embedding is assigned map-only to its nearest frozen centroid
(the identical ``_with_nearest_cell`` fold every batch searcher uses —
a stream-static broadcast of the one-row cells array, zero shuffle per
row), and the running per-cell arrival counts are the live drift signal
the batch ledger snapshots.

Scale notes (streaming ingest into a 100 TB index): the centroid array
is ~sqrt(N)·d·8 B (broadcast per microbatch by the stream-static join
machinery; a cluster deployment pins it); assignment adds no exchange
to the stream plan — the only stateful operator is the final
cells-bounded count aggregation, whose state is one long per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm
from ..operators.similarity import _with_nearest_cell


def emb_stream(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the embeddings parquet; schema probed from the
    static footer so generator drift (float vs double elements) cannot
    desynchronize the stream from the batch oracle."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "*")
    )


def ivf_assign_stream(delta: DataFrame, cent: DataFrame) -> DataFrame:
    """(cell_id, n_arrived): running arrival counts per frozen cell for
    a stream of (vec_id, embedding) rows."""
    vecs = delta.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("vn")
    )
    return (
        _with_nearest_cell(vecs, cent)
        .groupBy("cell_id")
        .agg(F.count("*").cast("long").alias("n_arrived"))
    )
