"""Streaming crawl ingest into WARC archives — the continuous form of
``operators/warc.write_warc_archive``: each microbatch commits its
records as gzip-membered ``.warc.gz`` shard files under
``out_dir/batch-<id>/``, sealed by a per-batch ``_SUCCESS`` marker.

Exactly-once at the file-format level: Spark's own file sinks get
replay idempotence from the ``_spark_metadata`` log, but a CUSTOM
container format written through foreachBatch has to build the commit
protocol itself — the same discipline as
``streaming/cluster_maintenance.py``'s state tables:

- a replayed batch (crash in the window between the batch's effects
  and the checkpoint commit) re-arrives with the SAME batch_id; its
  ``_SUCCESS`` is detected and the batch is skipped;
- a crash INSIDE a batch leaves shard files but no ``_SUCCESS``; the
  replay rewrites them byte-identically (records sorted by doc_id,
  deterministic gzip, atomic per-file rename) and then seals;
- readers (:func:`read_ingested`) consume only sealed batch dirs.

Scale: the shard write runs in executor tasks (one group task per
(batch, shard)); payload bytes never shuffle beyond the doc_id%S hash
exchange; at deployment the same task writes to object storage and
the marker is the store's conditional put.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-run observability (the LAST_RUN_BATCHES pattern): non-empty
# batches committed, replays skipped as already-sealed
LAST_INGEST = {"batches": 0, "skipped": 0}


def run_warc_ingest(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    shards: int = 4,
) -> None:
    """Drive a bounded ``(doc_id, text, ...)`` stream to completion,
    committing each microbatch as a sealed batch of .warc.gz shards."""
    from ..operators.warc import write_warc

    LAST_INGEST["batches"] = 0
    LAST_INGEST["skipped"] = 0

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bdir = os.path.join(out_dir, f"batch-{batch_id:05d}")
        done = os.path.join(bdir, "_SUCCESS")
        if os.path.exists(done):
            LAST_INGEST["skipped"] += 1
            return
        batch = batch_df.select(
            "doc_id",
            (F.col("doc_id") % shards).cast("int").alias("shard"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        os.makedirs(bdir, exist_ok=True)

        def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            pdf = pdf.sort_values("doc_id")
            archive = write_warc(
                [
                    {
                        "payload": bytes(p),
                        "record_id": f"<urn:uuid:doc-{d}>",
                        "target_uri": f"urn:doc:{d}",
                    }
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ]
            )
            final = os.path.join(bdir, f"shard-{shard:05d}.warc.gz")
            fd, tmp = tempfile.mkstemp(dir=bdir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(archive)
            os.replace(tmp, final)  # atomic per-file publish
            return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

        written = (
            batch.groupBy("shard")
            .applyInPandas(write_shard, schema="shard int, n long")
            .collect()  # bounded: <= `shards` rows
        )
        if not written:  # empty microbatch: nothing to seal
            return
        with open(done, "w"):
            pass  # the seal — readers only consume sealed dirs
        LAST_INGEST["batches"] += 1

    q = (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        # stop() is asynchronous; a fast restart on the SAME
        # checkpoint dir races the deregistration and Spark rejects it
        # as concurrent use — wait for full termination (the restart
        # matrix does exactly that back-to-back restart)
        q.awaitTermination()


def read_ingested(spark: SparkSession, out_dir: str) -> DataFrame:
    """Batch-read every SEALED batch dir's archives back to per-record
    rows (doc_id, content_length, payload_md5) — parse_warc over
    binaryFile, one task per archive file."""
    from collections.abc import Iterator

    from ..operators.warc import parse_warc

    sealed = sorted(
        d
        for d in glob.glob(os.path.join(out_dir, "batch-*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    )
    if not sealed:
        return spark.createDataFrame(
            [], "doc_id long, content_length long, payload_md5 string"
        )
    # pathGlobFilter instead of a glob IN the path (r14): a wildcard
    # base path makes FileStreamSink's metadata-dir probe log a full
    # FileNotFoundException stack at WARN — same file set, quiet scan.
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.warc.gz")
        .load(sealed)
        .select("content")
    )

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            rows = {"doc_id": [], "content_length": [], "payload_md5": []}
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content)):
                    rows["doc_id"].append(
                        int(rec["headers"]["warc-target-uri"].split(":")[-1])
                    )
                    rows["content_length"].append(len(rec["payload"]))
                    rows["payload_md5"].append(
                        _hashlib.md5(rec["payload"]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        parse_files,
        schema="doc_id long, content_length long, payload_md5 string",
    )
