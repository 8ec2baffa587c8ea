"""Edge-case parity hardening: tokenizer Unicode semantics (SURVEY
§2.6's named risk), sf_dir shape robustness, and the reference's own
corpus as input."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.functions.text import tokens_col
from mapreduce_framework_in_go_spark.operators import mapreduce as mr
from mapreduce_framework_in_go_spark.registry import all_queries

from .oracle import rows_canonical

SPECS = all_queries()

NASTY = [
    "curly ‘quotes’ and—dashes",
    "café naïve résumé",
    "中文分词 test",
    "num3ric s0up",
    "™®© marks",
    "",
]


def test_tokenizer_three_way_parity(spark):
    """Spark split('[^\\p{L}]+') == Python unicode.isalpha runs ==
    DuckDB regexp_extract_all('[\\p{L}]+') on non-ASCII text — the Go
    unicode.IsLetter contract all three must share."""
    df = spark.createDataFrame([(s,) for s in NASTY], schema="text string")
    spark_tokens = [
        r["toks"] for r in df.select(tokens_col("text").alias("toks")).collect()
    ]
    python_tokens = [[t for t, _ in mr.wc_map("d", s)] for s in NASTY]
    con = duckdb.connect()
    duck_tokens = [
        con.execute(
            "SELECT regexp_extract_all(?, '[\\p{L}]+')", [s]
        ).fetchone()[0]
        for s in NASTY
    ]
    assert spark_tokens == python_tokens == duck_tokens


def test_trailing_slash_sf_dir(spark, sf_dir):
    """The driver may pass sf_dir with a trailing slash."""
    a = SPECS["mr_wordcount"].fn(spark, sf_dir)
    b = SPECS["mr_wordcount"].fn(spark, sf_dir + "/")
    ca = rows_canonical(a.columns, [tuple(r) for r in a.collect()])
    cb = rows_canonical(b.columns, [tuple(r) for r in b.collect()])
    assert ca == cb


REF_CORPUS = "/root/reference/main"


@pytest.mark.skipif(
    not os.path.isdir(REF_CORPUS)
    or not any(f.startswith("pg-") for f in os.listdir(REF_CORPUS)),
    reason="reference corpus not present",
)
def test_wordcount_on_reference_corpus(spark):
    """End-to-end on the reference's actual input (8 Project Gutenberg
    books, read-only): whole-file scan -> wc pipeline vs a DuckDB
    oracle over the same files. This is the exact job the reference's
    test-mr.sh golden-diffs (main/test-mr.sh:33-67)."""
    docs = spark.read.text(f"{REF_CORPUS}/pg-*.txt", wholetext=True).select(
        F.col("value").alias("content")
    )
    got = (
        docs.select(F.explode(tokens_col("content")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(regexp_extract_all(content, '[\\p{{L}}]+')) AS word
          FROM read_text('{REF_CORPUS}/pg-*.txt')
        ) GROUP BY word
        """
    )
    cols = [d[0] for d in want.description]
    assert rows_canonical(got.columns, [tuple(r) for r in got.collect()]) == \
        rows_canonical(cols, want.fetchall())


def test_timezone_independence(spark, duck):
    """The driver's session may not pin UTC: the time-handling queries
    must hash-match the (timezone-naive) oracle under a hostile session
    timezone (+12:45)."""
    from .oracle import compare

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Chatham")
    try:
        for name in [
            "events_hourly_agg",
            "events_sessionization",
            "date_functions",
            "asof_join_event_order",
            "range_join_pre_purchase",
            "q4_order_priority",
            # streaming twins render via _utc_str: must be TZ-free too
            "stream_hourly_agg",
            "stream_session_windows",
            "stream_sliding_agg",
            "events_trailing_1h_sum",
            "events_retention",
            "kv_snapshot_at",
            "event_anomaly_hours",
            "stream_anomaly_hours",
            "privacy_k_anonymity",
            "reconcile_snapshots",
            "column_profile",
            # lead-window gap + stateful epoch-micros fold: TZ-free
            "event_transition_matrix",
            "stream_transition_matrix",
            "scd2_user_history",
            "resample_gapfill",
        ]:
            from .conftest import SF_DIR

            compare(SPECS[name].fn(spark, SF_DIR), duck, SPECS[name].oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_missing_table_raises_path_not_found(spark, tmp_path):
    """A missing table directory must surface Spark's PATH_NOT_FOUND
    analysis error, not a silent empty frame."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from mapreduce_framework_in_go_spark.sources.tables import table

    with pytest.raises(AnalysisException):
        table(spark, str(tmp_path), "lineitem").collect()


def test_events_ts_layout_variants_normalize_identically(spark, tmp_path):
    """The generator has already switched events.ts layouts between
    rounds (INT64 nanos -> micros NTZ). The probe must normalize every
    plausible layout — logical-nanos, NTZ micros, UTC-instant micros,
    bare INT64 in seconds/millis/micros/nanos, and ISO naive strings —
    to the same naive
    wall clock, using footer metadata only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_in_go_spark.sources.tables import table

    t_us = [1_767_323_045_123_456, 1_767_323_046_000_000]
    expected = None
    variants = {
        "ntz_us": pa.array(t_us, type=pa.timestamp("us")),
        "instant_us": pa.array(t_us, type=pa.timestamp("us", tz="UTC")),
        "logical_ns": pa.array([v * 1000 for v in t_us], type=pa.timestamp("ns")),
        "int64_ns": pa.array([v * 1000 for v in t_us], type=pa.int64()),
        "int64_us": pa.array(t_us, type=pa.int64()),
        "int64_ms": pa.array([v // 1000 for v in t_us], type=pa.int64()),
        "int64_s": pa.array([v // 1_000_000 for v in t_us], type=pa.int64()),
        "iso_string": pa.array(
            ["2026-01-02 03:04:05.123456", "2026-01-02 03:04:06.000000"],
            type=pa.string(),
        ),
    }
    for name, arr in variants.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": pa.array([1, 2], type=pa.int64()), "ts": arr}),
            str(d / "events.parquet"),
        )
        got = [
            r["s"]
            for r in table(spark, str(d), "events")
            .selectExpr("date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS s")
            .orderBy("s")
            .collect()
        ]
        if name in ("int64_ms", "int64_s"):
            # coarser units lose sub-unit digits of the fixture by
            # construction; compare at their own precision
            trunc = 23 if name == "int64_ms" else 19
            assert [g[:trunc] for g in got] == [e[:trunc] for e in (expected or got)]
            continue
        if expected is None:
            expected = got
        assert got == expected, name
    assert expected is not None and "2026" == expected[0][:4]
