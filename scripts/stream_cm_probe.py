"""Measurement-only probe: stream_cluster_maintenance per-batch
build/exec split (LAST_RUN_BATCHES) plus wall time, N runs.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
        python scripts/stream_cm_probe.py [--runs 3]

Not part of any gate; never writes BENCH_LOCAL.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from mapreduce_framework_in_go_spark.registry import all_queries
from mapreduce_framework_in_go_spark.session import get_spark
from mapreduce_framework_in_go_spark.streaming.cluster_maintenance import (
    LAST_RUN_BATCHES,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stream_cm_probe")
    specs = all_queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, schema="id long").count()

    fn = specs["stream_cluster_maintenance"].fn
    # warm run: absorbs the one-time memoized base artifact build
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for i in range(args.runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(
            f"run {i}: wall={dt:.3f} batches={LAST_RUN_BATCHES['n']} "
            f"build={LAST_RUN_BATCHES['build_sec']:.3f} "
            f"exec={LAST_RUN_BATCHES['exec_sec']:.3f} "
            f"state_io={LAST_RUN_BATCHES['state_io_sec']:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
