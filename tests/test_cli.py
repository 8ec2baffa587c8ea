"""The runnable-app surface: wc/indexer app parity over whole-file
splits, query dispatch, and the registry listing."""

import subprocess
import sys

import pytest

from mapreduce_framework_in_go_spark.__main__ import (
    app_indexer,
    app_wordcount,
    run_query,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "a.txt").write_text("the quick brown fox\nthe lazy dog")
    (d / "b.txt").write_text("the dog barks")
    return str(d / "*.txt")


def test_wc_app_matches_reference_semantics(spark, corpus):
    got = {r.word: r.cnt for r in app_wordcount(spark, corpus).collect()}
    assert got == {
        "the": 3, "quick": 1, "brown": 1, "fox": 1,
        "lazy": 1, "dog": 2, "barks": 1,
    }


def test_indexer_app_output_shape(spark, corpus):
    """'%d %s' with the doc list sorted — mrapps/indexer.go:36-39."""
    got = {r.word: r.index_line for r in app_indexer(spark, corpus).collect()}
    assert got["the"] == "2 a.txt,b.txt"
    assert got["dog"] == "2 a.txt,b.txt"
    assert got["barks"] == "1 b.txt"


def test_canonical_sink_is_one_sorted_file(spark, corpus, tmp_path):
    from mapreduce_framework_in_go_spark.sources.sinks import write_kv_text

    out = tmp_path / "wc_out"
    write_kv_text(
        app_wordcount(spark, corpus), str(out),
        key="word", value="cnt", canonical=True,
    )
    parts = sorted(out.glob("part-*"))
    assert len(parts) == 1  # the mr-out-0 shape
    lines = parts[0].read_text().splitlines()
    assert lines == sorted(lines)
    assert "dog 2" in lines and "the 3" in lines


def test_run_query_dispatch_and_unknown_name(spark, sf_dir):
    df = run_query(spark, "dedup_exact", sf_dir)
    assert df.count() > 0
    with pytest.raises(SystemExit, match="dedup_exact"):
        run_query(spark, "dedup_exa", sf_dir)  # hint lists close names


def test_cli_list_needs_no_spark_session():
    out = subprocess.run(
        [sys.executable, "-m", "mapreduce_framework_in_go_spark",
         "list", "--tag", "mapreduce"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "mr_wordcount" in out.stdout
    assert "SparkSession" not in out.stderr  # listing must not start a JVM


def test_mrrun_plugin_contract(spark, corpus, tmp_path):
    """A user file defining Map/Reduce runs end to end — the reference's
    wc.so plugin path, with values sorted before Reduce."""
    from mapreduce_framework_in_go_spark.__main__ import run_mr_plugin

    plugin = tmp_path / "capp.py"
    plugin.write_text(
        "def Map(doc, contents):\n"
        "    for tok in contents.split():\n"
        "        yield tok, doc\n"
        "def Reduce(key, values):\n"
        "    assert values == sorted(values)  # the mr_run ordering contract\n"
        "    return ','.join(dict.fromkeys(values))\n"
    )
    got = {
        r.key: r.value
        for r in run_mr_plugin(spark, str(plugin), corpus).collect()
    }
    assert got["the"] == "a.txt,b.txt"
    assert got["barks"] == "b.txt"


def test_mrrun_rejects_plugin_without_contract(spark, corpus, tmp_path):
    from mapreduce_framework_in_go_spark.__main__ import run_mr_plugin

    bad = tmp_path / "bad.py"
    bad.write_text("def mapper(d, c): return []\n")
    with pytest.raises(SystemExit, match="must define Map"):
        run_mr_plugin(spark, str(bad), corpus)
