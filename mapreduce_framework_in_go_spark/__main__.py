"""Command-line surface — the runnable-app parity layer.

The reference is USED as a set of runnable programs: a coordinator and
workers launched over input text files, producing sorted ``"key value"``
output files (``main/mrcoordinator.go`` + ``main/mrworker.go`` driving
``mrapps/wc.go`` / ``mrapps/indexer.go``; the sequential oracle
``main/mrsequential.go`` writes ``mr-out-0``). A user switching engines
needs that entry point, not only a library:

    python -m mapreduce_framework_in_go_spark wc 'data/pg-*.txt' out/
    python -m mapreduce_framework_in_go_spark indexer 'data/*.txt' out/
    python -m mapreduce_framework_in_go_spark list --tag dedup
    python -m mapreduce_framework_in_go_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --show 10
    python -m mapreduce_framework_in_go_spark run dedup_exact \
        --out /tmp/dups --format parquet

``wc``/``indexer`` follow the reference app contract end to end:
whole-file splits (one record per file, the ``Map(filename, contents)``
input shape), letter-run tokens, and the canonical sorted text sink
(the ``mr-out-0`` shape; pass ``--sharded`` for per-task ``mr-out-Y``
files through the committer instead — the form a cluster run uses).
``run`` executes any registered query; ``list`` enumerates the
registry. Cluster deployments pass the same script to ``spark-submit``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def app_wordcount(spark: SparkSession, path_glob: str) -> DataFrame:
    """(word, cnt) over whole-file text splits — mrapps/wc.go semantics."""
    from .functions.text import tokens_col
    from .sources.tables import scan_text_corpus

    return (
        scan_text_corpus(spark, path_glob)
        .select(F.explode(tokens_col("content")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def app_indexer(spark: SparkSession, path_glob: str) -> DataFrame:
    """(word, "n_docs doc,doc,...") — mrapps/indexer.go output shape."""
    from .functions.text import tokens_col
    from .sources.tables import scan_text_corpus

    pairs = (
        scan_text_corpus(spark, path_glob)
        .select(F.explode(tokens_col("content")).alias("word"), "doc")
        .distinct()
    )
    return pairs.groupBy("word").agg(
        F.concat_ws(
            " ",
            F.count("*").cast("string"),
            F.array_join(F.sort_array(F.collect_set("doc")), ","),
        ).alias("index_line")
    )


def _write_app_output(df: DataFrame, out: str, key: str, value: str,
                      sharded: bool) -> None:
    from .sources.sinks import write_kv_text

    write_kv_text(df, out, key=key, value=value, canonical=not sharded)


def run_mr_plugin(
    spark: SparkSession, plugin_path: str, input_glob: str
) -> DataFrame:
    """The ``mrworker wc.so`` analogue: load a user Python file defining
    ``Map(doc, contents) -> iterable[(k, v)]`` and
    ``Reduce(key, sorted_values) -> value`` (the reference plugin
    contract, ``mr/worker.go:38``) and run it over whole-file splits.

    The plugin file is shipped to executors via ``addPyFile`` so the
    Map/Reduce closures unpickle there regardless of how the driver
    loaded them."""
    import importlib.util
    import os

    from .operators.mapreduce import mr_run
    from .sources.tables import scan_text_corpus

    modname = os.path.splitext(os.path.basename(plugin_path))[0]
    spec = importlib.util.spec_from_file_location(modname, plugin_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    try:
        map_fn, reduce_fn = mod.Map, mod.Reduce
    except AttributeError as e:
        raise SystemExit(
            f"{plugin_path}: a plugin must define Map(doc, contents) "
            "and Reduce(key, values)"
        ) from e
    spark.sparkContext.addPyFile(plugin_path)
    docs = scan_text_corpus(spark, input_glob)
    return mr_run(docs, map_fn, reduce_fn, doc_col="doc", content_col="content")


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    from .registry import all_queries

    specs = all_queries()
    if name not in specs:
        close = sorted(n for n in specs if name.lower() in n.lower())[:8]
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        raise SystemExit(f"unknown query {name!r}{hint}")
    return specs[name].fn(spark, sf_dir)


def _sink(df: DataFrame, out: str | None, fmt: str, show: int) -> None:
    if out is None:
        df.show(show, truncate=False)
        return
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(out)
    elif fmt == "jsonl":
        df.write.mode("overwrite").json(out)
    elif fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(out)
    else:
        raise SystemExit(f"unknown --format {fmt!r}")
    print(f"wrote {out} ({fmt})")


def _get_spark(args) -> SparkSession:
    from .session import get_spark

    return get_spark(app_name=f"cli-{args.cmd}", cpus=args.cpus)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m mapreduce_framework_in_go_spark")
    p.add_argument(
        "--cpus",
        type=int,
        default=None,  # None lets get_spark honor $SPARK_GRAFT_CPUS
        help="local cores (default: $SPARK_GRAFT_CPUS, else 32)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    for app in ("wc", "indexer"):
        ap = sub.add_parser(app, help=f"run the {app} app over text files")
        ap.add_argument("input_glob", help="file glob, one split per file")
        ap.add_argument("out", help="output directory (text lines)")
        ap.add_argument(
            "--sharded",
            action="store_true",
            help="per-task mr-out-Y files instead of one sorted mr-out-0",
        )

    mp = sub.add_parser(
        "mrrun", help="run a user Map/Reduce plugin file (the wc.so path)"
    )
    mp.add_argument("plugin", help="python file defining Map and Reduce")
    mp.add_argument("input_glob")
    mp.add_argument("out")
    mp.add_argument("--sharded", action="store_true")

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", default=None)

    rp = sub.add_parser("run", help="run a registered query")
    rp.add_argument("name")
    rp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rp.add_argument("--out", default=None, help="write instead of show")
    rp.add_argument("--format", default="parquet",
                    choices=["parquet", "jsonl", "csv"])
    rp.add_argument("--show", type=int, default=20)

    args = p.parse_args(argv)

    if args.cmd == "list":
        from .registry import all_queries

        for name, spec in sorted(all_queries().items()):
            if args.tag and args.tag not in spec.tags:
                continue
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t[{', '.join(spec.tags)}] ({oracle})")
        return 0

    spark = _get_spark(args)
    if args.cmd == "wc":
        df = app_wordcount(spark, args.input_glob)
        _write_app_output(df, args.out, "word", "cnt", args.sharded)
    elif args.cmd == "indexer":
        df = app_indexer(spark, args.input_glob)
        _write_app_output(df, args.out, "word", "index_line", args.sharded)
    elif args.cmd == "mrrun":
        df = run_mr_plugin(spark, args.plugin, args.input_glob)
        _write_app_output(df, args.out, "key", "value", args.sharded)
    elif args.cmd == "run":
        _sink(run_query(spark, args.name, args.sf_dir), args.out,
              args.format, args.show)
    return 0


if __name__ == "__main__":
    sys.exit(main())
