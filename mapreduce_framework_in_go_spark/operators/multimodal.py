"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed with Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partition-preserving maps) is real and oracle-checked; the actual
codec decode is stubbed (`decode_media`) because no image/audio
libraries exist in this environment.

The synthetic corpus has no binary table, so payloads are derived
deterministically: ``payload = utf8_bytes(text)`` with a media type
assigned by ``doc_id % 3``. That keeps every byte-level operation
(slicing, hashing, histogramming) honestly binary on the Spark side
while remaining expressible over ``documents`` for the DuckDB oracle
(``encode(text)`` is the same byte string).

Scale notes (100 TB of media): all three queries are per-row map work —
zero shuffles except the small final aggregates; binary columns ride
Arrow record batches into pandas, so throughput is bounded by
serialization bandwidth, not Python call overhead. On a real corpus the
payloads would come from parquet binary columns or file refs
(spark.read.format('binaryFile')); frame sampling emits rows per frame,
so an exploding fan-out is bounded per-task by spark.sql.files
partition sizing, not by driver memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

MEDIA_TYPES = ["image", "audio", "video"]
FRAME_BYTES = 16
FRAME_STRIDE = 4
HIST_BINS = 16


def decode_media(payload: bytes, media_type: str):
    """Real codec decode (PIL / soundfile / av). Not available in this
    container — the deterministic byte-level stand-ins below exercise
    the identical Spark plumbing (binary in, typed rows out)."""
    raise NotImplementedError(
        "media codecs are not installed; use the byte-level operators "
        "(mm_metadata / mm_frame_sample / mm_byte_histogram) which share "
        "the same mapInPandas plumbing"
    )


def _media_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents lifted to a multimodal table: (doc_id, media_type,
    payload BINARY). The cast to binary is the real column type the
    pandas UDFs consume."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@register(
    "mm_metadata",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height
    FROM documents
    """,
    doc="Metadata extraction over binary payloads: byte length and md5 "
    "digest are JVM built-ins (F.length/F.md5 — codegen'd, no Python "
    "round-trip for columns Spark can compute natively); only the fake "
    "header parse (the stand-in for a real image-header read, which "
    "genuinely needs custom byte logic) goes through Arrow-batched "
    "mapInPandas. Pure map — partition-preserving, no shuffle.",
    tags=["multimodal"],
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_docs(spark, sf_dir).select(
        "doc_id",
        "media_type",
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )

    def parse_header(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Stand-in for the codec header read (see decode_media): receives
        # the binary payload batch like a real parser would, derives the
        # dimensions deterministically from the JVM-computed length (no
        # per-row Python len() — that column already rides the batch).
        for pdf in batches:
            n_bytes = pdf["n_bytes"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "payload_md5": pdf["payload_md5"],
                    "width": n_bytes % 640 + 1,
                    "height": (n_bytes * 7) % 480 + 1,
                }
            )

    return media.mapInPandas(
        parse_header,
        schema="doc_id long, media_type string, n_bytes long, "
        "payload_md5 string, width long, height long",
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)
               AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           md5(substr(hx, CAST(f * {FRAME_BYTES} * 2 + 1 AS INTEGER),
                      {FRAME_BYTES * 2})) AS frame_md5
    FROM v, unnest(range(0, n_frames, {FRAME_STRIDE})) u(f)
    """,
    doc=f"Frame sampling over 'video' payloads: treat the binary as "
    f"{FRAME_BYTES}-byte frames, emit every {FRAME_STRIDE}th frame with "
    "its digest via mapInPandas (1 row in, n rows out — the UDTF batch "
    "shape a real decoder would use). Fan-out is bounded per task; no "
    "shuffle.",
    tags=["multimodal"],
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_docs(spark, sf_dir).where(F.col("media_type") == "video")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = -(-len(data) // FRAME_BYTES)
                for f in range(0, n_frames, FRAME_STRIDE):
                    frame = data[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                    out_doc.append(doc_id)
                    out_idx.append(f)
                    out_md5.append(
                        hashlib.md5(frame.hex().upper().encode("ascii")).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.mapInPandas(
        sample, schema="doc_id long, frame_idx long, frame_md5 string"
    )


@register(
    "mm_byte_histogram",
    oracle=f"""
    SELECT doc_id, CAST(unicode(c) % {HIST_BINS} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
          FROM documents WHERE doc_id % 3 = 0)
    GROUP BY 1, 2
    """,
    doc=f"Stubbed 'decode': {HIST_BINS}-bin byte-value histogram over "
    "'image' payloads — the deterministic stand-in for a pixel "
    "histogram, running the exact plumbing a real decoder would "
    "(binary in via Arrow, numpy over the buffer, typed rows out). "
    "Oracle side uses codepoints == bytes (corpus is ASCII). One small "
    "groupBy after the map.",
    tags=["multimodal"],
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_docs(spark, sf_dir).where(F.col("media_type") == "image")

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_doc, out_bin, out_n = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8) % HIST_BINS
                bins, counts = np.unique(arr, return_counts=True)
                out_doc.extend([doc_id] * len(bins))
                out_bin.extend(bins.tolist())
                out_n.extend(counts.tolist())
            yield pd.DataFrame({"doc_id": out_doc, "bin": out_bin, "n": out_n})

    return media.mapInPandas(hist, schema="doc_id long, bin long, n long")


@register(
    "mm_modality_stats",
    oracle="""
    WITH m AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS payload_md5
      FROM documents
    )
    SELECT media_type,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(n_bytes) AS BIGINT) AS min_bytes,
           CAST(max(n_bytes) AS BIGINT) AS max_bytes,
           CAST(count(DISTINCT payload_md5) AS BIGINT) AS distinct_payloads
    FROM m GROUP BY media_type
    """,
    doc="Per-modality corpus statistics: doc count, byte totals/extrema "
    "and distinct-payload cardinality per media type — the dataset-card "
    "rollup a multimodal corpus build publishes. Everything is "
    "JVM-side (length/md5 on the binary column) with map-side partial "
    "aggregation; shuffle carries one partial row per (partition, "
    "modality).",
    tags=["multimodal"],
)
def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_docs(spark, sf_dir)
    return (
        media.select(
            "media_type",
            F.length("payload").cast("long").alias("n_bytes"),
            F.md5("payload").alias("payload_md5"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
            F.count_distinct("payload_md5").alias("distinct_payloads"),
        )
    )


@register(
    "mm_dedup",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           md5(text) AS payload_md5,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS rep_doc_id
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Exact media dedup: payloads grouped by (modality, md5 digest), "
    "smallest doc_id elected representative. The digest is computed "
    "map-side on the JVM (F.md5 over the BINARY column), so the "
    "shuffle carries (32-byte digest, id) — never the payload bytes: "
    "at 100 TB of media that is the difference between shuffling "
    "kilobyte keys and shuffling the corpus. Same discipline as "
    "dedup_exact on text, here over the binary payload column the "
    "multimodal family shares.",
    tags=["multimodal", "dedup"],
)
def mm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_docs(spark, sf_dir)
    return (
        media.select(
            "media_type", F.md5("payload").alias("payload_md5"), "doc_id"
        )
        .groupBy("media_type", "payload_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("rep_doc_id"),
        )
    )
