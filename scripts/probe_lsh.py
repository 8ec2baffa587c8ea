"""Instrumented repeat-runner for dedup_clusters_lsh (round-9 verdict
ask #1: root-cause the 3.8-11.1 s bimodality before trusting any
slack override).

Runs the query N times in ONE session at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the exact bench action (noop write), printing per run:

- wall: end-to-end seconds (what bench.py records)
- edges: seconds to materialize the LSH pair pipeline (shingle build ->
  signatures -> band join -> Jaccard verification -> first
  localCheckpoint) — dedup.RUN_STATS["cc_edges_sec"]
- rounds / round_secs: large-star/small-star convergence rounds and
  per-round seconds — RUN_STATS["cc_rounds"/"cc_round_secs"]
- expand: wall - edges - sum(round_secs) ≈ exact-collapse expansion +
  labeling + sink
- built/reused: generation-cache behavior (shingle frame builds)

Usage: python scripts/probe_lsh.py [n_runs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_in_go_spark import registry
from mapreduce_framework_in_go_spark.operators import dedup
from mapreduce_framework_in_go_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_operators()
    spark = get_spark()
    fn = registry.REGISTRY["dedup_clusters_lsh"].fn
    print(f"host load {open('/proc/loadavg').read().split()[0]}  sf={sf_dir}")
    for i in range(n):
        dedup.RUN_STATS.clear()
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        s = dedup.RUN_STATS
        rounds_total = sum(s.get("cc_round_secs", []))
        print(
            json.dumps(
                {
                    "run": i,
                    "wall": round(wall, 3),
                    "edges": s.get("cc_edges_sec"),
                    "rounds": s.get("cc_rounds"),
                    "round_secs": s.get("cc_round_secs"),
                    "expand": round(
                        wall - (s.get("cc_edges_sec") or 0) - rounds_total, 3
                    ),
                    "built": s.get("lsh_shingles_built", 0),
                    "reused": s.get("lsh_shingles_reused", 0),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
