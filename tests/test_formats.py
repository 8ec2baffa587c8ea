"""JSONL / CSV interchange round-trips (sources/formats.py): every
table value must survive parquet -> text format -> parquet unchanged,
including timestamps under a hostile session timezone and strings
containing delimiters/quotes."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.sources import formats


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_jsonl_roundtrip_events(spark, sf_dir, tmp_path):
    """events has the trickiest column (timestamp); round-trip under a
    non-UTC session TZ must be lossless to the microsecond."""
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Chatham")
    try:
        formats.write_jsonl(src, str(tmp_path / "ev"))
        back = formats.read_jsonl(spark, str(tmp_path / "ev"), src.schema)
        assert back.schema == src.schema
        assert _canon(back) == _canon(src)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_jsonl_roundtrip_embeddings_nested(spark, sf_dir, tmp_path):
    """array<float> must survive JSONL (nested types are JSON-native)."""
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    formats.write_jsonl(src, str(tmp_path / "emb"))
    back = formats.read_jsonl(spark, str(tmp_path / "emb"), src.schema)
    assert _canon(back) == _canon(src)


def test_csv_roundtrip_documents_quoting(spark, sf_dir, tmp_path):
    """documents.text exercises CSV quoting; inject a row with commas,
    quotes and a newline to pin the escaping contract."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nasty = spark.createDataFrame(
        [(999_999, 'a,b "quoted" c\nnewline', "xx", "srcX", 23)],
        src.schema,
    )
    src = src.unionAll(nasty)
    formats.write_csv(src, str(tmp_path / "docs"))
    back = formats.read_csv(
        spark, str(tmp_path / "docs"), src.schema, multiline=True
    )
    assert _canon(back) == _canon(src)


def test_csv_failfast_rejects_malformed(spark, tmp_path):
    """FAILFAST must raise on a malformed row, not silently null it —
    silent permissive parsing is data loss at scale."""
    import pytest

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    df = formats.read_csv(
        spark, str(p), spark.range(0).selectExpr("CAST(id AS INT) a", "CAST(id AS INT) b").schema
    )
    with pytest.raises(Exception):
        df.collect()


def test_orc_roundtrip_events_and_pushdown(spark, sf_dir, tmp_path):
    """events -> ORC -> events must be lossless (TIMESTAMP_NTZ
    preserved, session-TZ independent), and a filtered read must push
    the predicate into the ORC scan (PushedFilters), keeping the
    parquet-class scale contract column formats exist for."""
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Chatham")
    try:
        formats.write_orc(src, str(tmp_path / "ev"), bloom_columns="user_id")
        back = formats.read_orc(spark, str(tmp_path / "ev"), src.schema)
        assert back.schema == src.schema
        assert _canon(back) == _canon(src)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    from mapreduce_framework_in_go_spark.plans import formatted_plan

    filtered = back.where(F.col("user_id") == 7).select("event_id")
    plan = formatted_plan(filtered)
    assert "PushedFilters: [" in plan and "user_id" in plan.split(
        "PushedFilters:"
    )[1].splitlines()[0]


def test_orc_roundtrip_embeddings_nested(spark, sf_dir, tmp_path):
    """array<float> survives ORC (nested types are first-class)."""
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    formats.write_orc(src, str(tmp_path / "emb"))
    back = formats.read_orc(spark, str(tmp_path / "emb"), src.schema)
    assert _canon(back) == _canon(src)
