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
