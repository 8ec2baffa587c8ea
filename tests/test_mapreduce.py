"""MR-compat surface tests: oracle parity (the reference's golden-diff
technique, main/test-mr.sh:59-67), mr_run round-trip, and rerun
determinism (the crash test's invariant, main/test-mr.sh:194-203)."""

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.operators import mapreduce as mr
from mapreduce_framework_in_go_spark.registry import all_queries

from .oracle import compare, rows_canonical

QUERIES = all_queries()


def test_wordcount_oracle(spark, sf_dir, duck):
    compare(QUERIES["mr_wordcount"].fn(spark, sf_dir), duck, QUERIES["mr_wordcount"].oracle)


def test_inverted_index_oracle(spark, sf_dir, duck):
    q = QUERIES["mr_inverted_index"]
    compare(q.fn(spark, sf_dir), duck, q.oracle)


def test_crash_shape_oracle(spark, sf_dir, duck):
    q = QUERIES["mr_crash_shape"]
    compare(q.fn(spark, sf_dir), duck, q.oracle)


def test_mr_run_wordcount_roundtrip(spark, sf_dir):
    """The generic Map/Reduce UDF contract reproduces the built-in wc
    pipeline exactly (same tokenizer predicate: Unicode category L)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    generic = mr.mr_run(docs, mr.wc_map, mr.wc_reduce)
    builtin = QUERIES["mr_wordcount"].fn(spark, sf_dir).select(
        F.col("word").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    g = rows_canonical(generic.columns, [tuple(r) for r in generic.collect()])
    b = rows_canonical(builtin.columns, [tuple(r) for r in builtin.collect()])
    assert g == b


def test_rerun_determinism(spark, sf_dir):
    """Reference proves crash-safety by output identity across reruns
    (test-mr.sh crash test); our analogue: two independent executions of
    the order-sensitive aggregate hash identically."""
    q = QUERIES["mr_crash_shape"]

    def run():
        d = q.fn(spark, sf_dir)
        return rows_canonical(d.columns, [tuple(r) for r in d.collect()])

    assert run() == run()


def test_task_retry_tolerance(spark, sf_dir):
    """The crash app's real assertion: task failure + re-execution still
    yields oracle-identical output. Inject one task failure via a mapInPandas
    batch that throws on first attempt, rely on spark.task.maxFailures."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def flaky(batches):
        import os
        import tempfile

        marker = os.path.join(tempfile.gettempdir(), "mr_flaky_marker")
        for pdf in batches:
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected task failure (crash.go analogue)")
            yield pdf

    try:
        out = docs.mapInPandas(flaky, schema=docs.schema)
        n = out.count()
        assert n == docs.count()
    finally:
        import os
        import tempfile

        m = os.path.join(tempfile.gettempdir(), "mr_flaky_marker")
        if os.path.exists(m):
            os.remove(m)


def test_parallelism_probe(spark):
    """mtiming/rtiming analogue (mrapps/mtiming.go:19-62): tasks must
    actually overlap. Each of 8 partitions records its (start, end)
    wall-clock span around a short sleep; at least two spans must
    intersect on local[N>=2]."""
    import pandas as pd

    def probe(batches):
        import time

        start = time.time()
        n = sum(len(pdf) for pdf in batches)
        time.sleep(0.5)
        yield pd.DataFrame({"start": [start], "end": [time.time()], "n": [n]})

    spans = (
        spark.range(8)
        .repartition(8)
        .mapInPandas(probe, schema="start double, end double, n long")
        .collect()
    )
    assert len(spans) == 8
    overlaps = sum(
        1
        for i, a in enumerate(spans)
        for b in spans[i + 1 :]
        if a["start"] < b["end"] and b["start"] < a["end"]
    )
    assert overlaps >= 1, "no two tasks ran concurrently"


def test_whole_file_scan_roundtrip(spark, tmp_path):
    """S1 whole-file source contract (mr/worker.go:194-206): one record
    per file, (doc, content), driven through the generic mr_run word
    count and checked against a hand computation."""
    (tmp_path / "a.txt").write_text("the cat sat\non the mat")
    (tmp_path / "b.txt").write_text("the dog")
    from mapreduce_framework_in_go_spark.sources.tables import scan_text_corpus

    docs = scan_text_corpus(spark, str(tmp_path))
    rows = {r["doc"]: r["content"] for r in docs.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["a.txt"] == "the cat sat\non the mat"

    out = mr.mr_run(docs, mr.wc_map, mr.wc_reduce, doc_col="doc", content_col="content")
    got = {(r["key"], r["value"]) for r in out.collect()}
    assert got == {
        ("the", "3"), ("cat", "1"), ("sat", "1"), ("on", "1"),
        ("mat", "1"), ("dog", "1"),
    }


def test_mid_write_crash_discards_partial_output(spark, sf_dir, tmp_path):
    """S4 commit contract (mr/worker.go:56-82 temp+rename; exercised by
    the reference's worker-respawn loop, main/test-mr.sh:160-192): a
    task that dies MID-SINK-WRITE must leave no partial output. The
    poison yields rows to the text writer first — so the first attempt
    has already opened its task-temp file and written lines — then
    raises; the committer must discard that attempt's file and publish
    only the retry's. Verified by (a) output dir holds only committed
    part-files (no temp/in-progress artifacts), (b) the merged line set
    equals the canonical expected set exactly — no duplicated or torn
    lines from the crashed attempt."""
    import glob
    import os

    from mapreduce_framework_in_go_spark.sources.sinks import kv_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.length("text").cast("string").alias("value"),
    )
    expected = sorted(r["value"] for r in kv_lines(kv).collect())

    crash_marker = str(tmp_path / "crash_fired")

    def poison(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        crash = tc.partitionId() == 0 and tc.attemptNumber() == 0
        for i, pdf in enumerate(batches):
            yield pdf  # rows reach the file writer before the crash
            if crash:
                open(crash_marker, "w").close()
                raise RuntimeError("injected crash mid-sink-write")

    out = str(tmp_path / "crash_out")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    # several small Arrow batches per task => the writer has consumed
    # (and written) at least one batch before the poison fires
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        lines = kv_lines(kv).mapInPandas(poison, schema="value string")
        lines.write.mode("overwrite").text(out)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert os.path.exists(crash_marker), "poison never fired — test is vacuous"

    files = [os.path.basename(p) for p in glob.glob(os.path.join(out, "*"))]
    assert files, "sink produced no output"
    for f in files:
        assert f == "_SUCCESS" or (
            f.startswith("part-") and not f.endswith((".inprogress", ".tmp"))
        ), f"uncommitted artifact survived: {f}"
    assert "_SUCCESS" in files, "job-level commit marker missing"

    back = sorted(r["value"] for r in spark.read.text(out).collect())
    assert back == expected
