"""Registry-wide physical-plan lint — the scale-discipline backstop.

Per-query plan properties are pinned in test_plans.py; this lints EVERY
registered batch query against four structural rules that catch the
regression classes we have actually hit (rules 3 and 4 are documented
at their regex definitions below):

1. **No CartesianProduct.** A non-broadcast cross join is quadratic
   shuffle IO at scale; every deliberate cross in this repo is a
   broadcast of a 1-row/dimension-sized frame (BroadcastNestedLoopJoin),
   which is allowed.
2. **Bounded parquet scan count.** A DataFrame referenced by several
   consumers silently re-plans its whole subtree per consumer (the
   lm_kn_bigrams regression: 4 corpus scans for one logical pass until
   the count table was persisted). Queries exceeding the default budget
   must be whitelisted with a reason.

Streaming queries are excluded: invoking them drives a real stream to
completion (their batch rollup plans are trivial; stream-specific
shapes are covered in test_streaming.py).
"""

import re

import pytest

from mapreduce_framework_in_go_spark.plans import formatted_plan
from mapreduce_framework_in_go_spark.registry import all_queries

SPECS = all_queries()

MAX_SCANS = 8


def _count_scan_nodes(plan: str) -> int:
    """Count PARQUET scan nodes (the detail section numbers each node
    once, so matching the id-before-name form avoids the tree-section
    double count). r14: `Scan ExistingRDD` nodes no longer count —
    they are lineage-truncated checkpointed artifacts, exactly the
    shape this lint pushes toward (a re-planned SOURCE subtree is what
    the cap guards against); the generic name match used to count them
    and flagged ann_ivfpq_nprobe_tuning the moment its ground truth
    became an RDD-scan-rooted artifact."""
    return len(re.findall(r"\(\d+\) Scan parquet", plan))


# name -> (allowed scans, why the extra passes are inherent)
SCAN_WHITELIST = {
    "ann_ivf_recall": (25, "compares sample vs Lloyd-trained IVF against "
                           "the exact baseline: 3 search paths + 2 "
                           "training iterations over one dimension-sized "
                           "embedding table"),
    "ann_nprobe_tuning": (28, "parameter sweep: one trained-IVF search per "
                              "nprobe setting vs the exact baseline"),
    "ann_ivf_recall_structured": (30, "same sweep on the label-blended "
                                      "fixture"),
    "ann_ivf_incremental": (12, "cold-cache Lloyd training over the base "
                                "slice plus base/delta assignment and the "
                                "two 1-row total aggregates"),
    "knn_label_agreement": (12, "trained-IVF search (assignment + probe "
                                "+ verify passes over the embedding "
                                "table, cold-cache Lloyd chain included) "
                                "plus two column-pruned (vec_id, label) "
                                "scans for the query/neighbor label "
                                "joins"),
    "dedup_clusters_lsh": (12, "iterative star-contraction: bounded "
                               "O(log n) rounds, each referencing the "
                               "persisted edge frame"),
    "dedup_clusters_delta": (40, "composition of the frozen base "
                                 "clustering (its whole lineage prints "
                                 "inside the persisted base_labels "
                                 "InMemoryRelation, materialized once at "
                                 "build) + the delta merge, whose "
                                 "persisted control frames (digest "
                                 "groups, attach/new splits) likewise "
                                 "re-print their stored subtrees per "
                                 "consumer; executed scans per action "
                                 "are the membership assembly's ~6 "
                                 "digest passes"),
    "dedup_clusters_delta_merge_only": (14, "deployment-shape merge: the "
                                            "frozen base is checkpointed "
                                            "(zero scans), and the "
                                            "remaining scans are the "
                                            "persisted delta control "
                                            "frames (digest map, new-rep "
                                            "sketch, candidates, "
                                            "membership) each printing "
                                            "their column-pruned doc scan "
                                            "once, plus the corpus-wide "
                                            "digest map inside the "
                                            "persisted membership frame — "
                                            "a stored column at "
                                            "deployment"),
    "dedup_lsh_recall": (10, "sketch path + exact ground-truth path share "
                             "one persisted shingle frame; the remaining "
                             "scans are dimension-sized"),
    "corpus_release_manifest": (10, "capstone composition: survivor "
                                    "pipeline + n-gram decon + semantic "
                                    "decon each contribute their own "
                                    "(already-persisted) subtrees"),
}

BATCH = sorted(
    name for name, s in SPECS.items() if "streaming" not in s.tags
)

# 3. **No set-state window aggregates** (collect_set / collect_list over
#    a Window). A window buffer holding a per-row growing collection is
#    unbounded state on a hot partition key (the dedup_span_lcs df
#    regression: collect_set over PARTITION BY gram materialized a
#    df-sized set per occurrence row; a billion-occurrence boilerplate
#    gram = OOM). df-style counts belong in a two-phase
#    groupBy().agg(count_distinct) + join-back. Whitelisted uses must
#    have a bounded frame or a bounded partition by construction.
WINDOW_COLLECT_RE = re.compile(r"collect_(?:set|list)\(.*windowspecdefinition")
WINDOW_COLLECT_WHITELIST = {
    "events_trailing_median": "RANGE 1h trailing frame — buffer bounded "
                              "by a user's events per hour",
    "kv_linearizability": "fixture constructor: prefix replay over a "
                          "bounded synthetic per-key op log, not the "
                          "checking dataflow",
    "kv_linearizability_contract": "same fixture constructor",
}

# 4. **No unpartitioned window over an unbounded domain.** A
#    Window.orderBy without partitionBy plans Exchange SinglePartition —
#    the whole domain funnels through ONE task (the zipf_fit_tokens
#    regression: the full unigram vocab, 10^8+ types at web scale,
#    ranked on one core). Data-sized ranks must go through
#    relational.two_level_global_rank (RangePartitioning +
#    per-partition row_number + broadcast prefix-sum). The two-level
#    helper's own offsets window orders by the synthetic `pid` column
#    (one row per shuffle partition — bounded by cluster config, not
#    data) and is exempted structurally; every other unpartitioned
#    window must be whitelisted with a boundedness reason.
#    In the formatted plan an unpartitioned spec is a
#    windowspecdefinition whose FIRST argument already carries a sort
#    direction (partition columns print bare, order columns print
#    `col ASC/DESC NULLS ...`).
UNPART_WINDOW_RE = re.compile(
    r"windowspecdefinition\((\w+)#\d+\w* (?:ASC|DESC) NULLS"
)
UNPART_WINDOW_WHITELIST = {
    "sample_weighted": "group-offset cumsum over the 4096 synthetic "
                       "sampling groups (sampling.py) — frame size is a "
                       "design constant, not data-sized",
    "pack_sequences": "group cumsum over the 4096 packing groups "
                      "(training_prep.py) — constant-bounded",
    "pack_bestfit_shards": "same 4096-group cumsum",
    "pack_boundary_contamination": "same 4096-group cumsum plus the "
                                   "groups-sized junction rank",
    "training_shuffle_order": "same 4096-group cumsum over shuffle "
                              "groups",
    "training_shuffle_epoch2": "same 4096-group cumsum",
    "mix_alpha_allocation": "largest-remainder rank over the SOURCE "
                            "domain (a handful of corpus sources), "
                            "never documents",
    "skew_topkeys": "rank re-derived AFTER .limit(TOP_SKEW) — the "
                    "window input is the collected top-k, "
                    "constant-bounded",
    "dedup_simhash_tuning": "cumulative counts over the 65-row hamming "
                            "distance grid (dedup.py)",
    "triangle_count": "node-index rank on the dense-bitmap path only, "
                      "which triangle_count selects from the parquet "
                      "footer count precisely when the node domain is "
                      "small; the sparse path has no such window",
}


@pytest.mark.parametrize("name", BATCH)
def test_no_cartesian_and_bounded_scans(name, spark, sf_dir):
    plan = formatted_plan(SPECS[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, (
        f"{name}: non-broadcast cross join — quadratic shuffle at scale"
    )
    if name not in WINDOW_COLLECT_WHITELIST:
        assert not WINDOW_COLLECT_RE.search(plan), (
            f"{name}: collect_set/collect_list over a Window — unbounded "
            "window-buffer state on a hot key; aggregate two-phase "
            "(groupBy + join back) or whitelist with a bounded-frame reason"
        )
    if name not in UNPART_WINDOW_WHITELIST:
        unpart = [
            m.group(1)
            for m in UNPART_WINDOW_RE.finditer(plan)
            if m.group(1) != "pid"  # two_level_global_rank offsets
        ]
        assert not unpart, (
            f"{name}: unpartitioned window ordered by {sorted(set(unpart))} "
            "— Exchange SinglePartition funnels the whole domain through "
            "one task; route through relational.two_level_global_rank or "
            "whitelist with a boundedness reason"
        )
    scans = _count_scan_nodes(plan)
    cap, _why = SCAN_WHITELIST.get(name, (MAX_SCANS, ""))
    assert scans <= cap, (
        f"{name}: {scans} parquet scans (cap {cap}) — a subtree is being "
        "re-planned per consumer; persist the shared frame or whitelist "
        "with a reason"
    )
