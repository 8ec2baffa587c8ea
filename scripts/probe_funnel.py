"""Instrumented repeat-runner for pretrain_corpus_yield (round-10
verdict ask #1: root-cause the 5.35 -> 6.55 s quiet regression).

Runs the query N times in ONE session at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the exact bench action (noop write), printing per run:

- wall: end-to-end seconds (what bench.py records)
- build: seconds spent CONSTRUCTING the frame (py4j Column-DSL chatter
  for the flag/language-vote HOF trees) before any action
- exec: the noop write
- edges / rounds / round_secs: the LSH pair pipeline + CC convergence
  breakdown (dedup.RUN_STATS, same keys probe_lsh.py reads)
- built/reused: shingle-frame generation-cache behavior

Optionally interleaves a second variant for A/B (converged tails, one
process — the r10 discipline): pass variant names as extra args, e.g.
``python scripts/probe_funnel.py 6 bloom_prune_join`` alternates the
funnel with bloom_prune_join.

Usage: python scripts/probe_funnel.py [n_runs] [other_query ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_in_go_spark import registry
from mapreduce_framework_in_go_spark.operators import dedup
from mapreduce_framework_in_go_spark.session import get_spark


def run_one(spark, name: str, sf_dir: str) -> dict:
    fn = registry.REGISTRY[name].fn
    dedup.RUN_STATS.clear()
    t0 = time.monotonic()
    frame = fn(spark, sf_dir)
    t1 = time.monotonic()
    frame.write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    s = dedup.RUN_STATS
    rounds_total = sum(s.get("cc_round_secs", []))
    return {
        "q": name,
        "wall": round(t2 - t0, 3),
        "build": round(t1 - t0, 3),
        "exec": round(t2 - t1, 3),
        "edges": s.get("cc_edges_sec"),
        "rounds": s.get("cc_rounds"),
        "round_secs": s.get("cc_round_secs"),
        "expand": round(t2 - t0 - (s.get("cc_edges_sec") or 0) - rounds_total, 3),
        "built": s.get("lsh_shingles_built", 0),
        "reused": s.get("lsh_shingles_reused", 0),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    others = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_operators()
    spark = get_spark()
    print(f"host load {open('/proc/loadavg').read().split()[0]}  sf={sf_dir}")
    for i in range(n):
        for name in ["pretrain_corpus_yield", *others]:
            rec = run_one(spark, name, sf_dir)
            rec["run"] = i
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
