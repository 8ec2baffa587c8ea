"""Physical-plan shape assertions — the 100 TB discipline checks.

Correctness tests prove the small-SF answer; these prove the plan is
the one you'd want at scale: filters reach the parquet scan, projections
prune the ReadSchema, small dims broadcast, global top-k never sorts the
world.
"""

from mapreduce_framework_in_go_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    formatted_plan,
)
from mapreduce_framework_in_go_spark.registry import all_queries

SPECS = all_queries()


def test_filter_pushdown(spark, sf_dir):
    df = SPECS["filter_project"].fn(spark, sf_dir)
    assert_pushed_filters(df, "l_quantity", "l_returnflag")


def test_column_pruning(spark, sf_dir):
    plan = formatted_plan(SPECS["filter_project"].fn(spark, sf_dir))
    # ReadSchema must include only the needed columns, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" in read
    assert "l_shipdate" not in read and "l_partkey" not in read


def test_q6_predicates_pushed(spark, sf_dir):
    df = SPECS["q6_forecast_revenue"].fn(spark, sf_dir)
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_broadcast_dims(spark, sf_dir):
    assert_broadcast_join(SPECS["broadcast_dim_join"].fn(spark, sf_dir), 2)
    assert_broadcast_join(SPECS["q5_local_supplier_volume"].fn(spark, sf_dir), 3)


def test_topk_never_global_sorts(spark, sf_dir):
    plan = formatted_plan(SPECS["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_partial_agg(spark, sf_dir):
    """The shuffle must carry partially-aggregated counts, not raw tokens —
    Spark's map-side combine (the paper's combiner, free with groupBy)."""
    plan = formatted_plan(SPECS["mr_wordcount"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_whole_stage_codegen(spark, sf_dir):
    """AQE hides codegen markers until execution — check the executed plan."""
    df = SPECS["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" prefixes mark whole-stage-codegen spans in the executed plan
    assert "*(1)" in plan and "*(2)" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-tag-sort as-of join must plan exactly one exchange and
    one window — never an inequality join explosion."""
    import re

    plan = formatted_plan(SPECS["asof_join_event_order"].fn(spark, sf_dir))
    # formatted mode lists each node once in the tree and once in the
    # detail section — count detail entries "(n) Exchange"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Window" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_is_equi_join(spark, sf_dir):
    """Band bucketing must turn the interval predicate into an
    equi-join on (user, bucket); the range condition is a residual
    filter, not a nested-loop driver."""
    plan = formatted_plan(SPECS["range_join_pre_purchase"].fn(spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_exists_shapes_are_joins(spark, sf_dir):
    """Q4/Q21/Q22's EXISTS / NOT EXISTS must run as semi/anti joins —
    no collected ID lists, no nested loops."""
    for name in ["q4_order_priority", "q21_waiting_supplier", "q22_sales_opportunity"]:
        plan = formatted_plan(SPECS[name].fn(spark, sf_dir))
        assert "Cartesian" not in plan, name
        assert "LeftSemi" in plan or "LeftAnti" in plan, name


def test_tpch_dims_broadcast(spark, sf_dir):
    """Dimension joins in the extended TPC-H queries broadcast."""
    assert_broadcast_join(SPECS["q7_volume_shipping"].fn(spark, sf_dir), 2)
    assert_broadcast_join(SPECS["q9_product_type_profit"].fn(spark, sf_dir), 3)
    assert_broadcast_join(SPECS["q14_promo_revenue"].fn(spark, sf_dir), 1)


def test_tfidf_build_launches_no_job(spark, sf_dir):
    """Building the tfidf frame must be pure plan construction: the
    corpus size N is a broadcast 1-row aggregate, not a driver-side
    .count() action (which would run an extra Spark job per build).
    Baseline = a bare table read (spark.read.parquet's file-listing job
    is inherent); the query build must add ZERO jobs beyond it."""
    from mapreduce_framework_in_go_spark.sources.tables import table

    sc = spark.sparkContext

    def jobs_during(group, fn):
        sc.setJobGroup(group, "", False)
        try:
            fn()
        finally:
            sc.setJobGroup("", "", False)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    base = jobs_during("probe-read", lambda: table(spark, sf_dir, "documents"))
    build = jobs_during(
        "probe-tfidf", lambda: SPECS["text_tfidf"].fn(spark, sf_dir)
    )
    assert build == base


def test_mm_metadata_hashes_jvm_side(spark, sf_dir):
    """n_bytes/md5 must be JVM built-ins before the Python boundary:
    the plan shows length/md5 in a Project under the scan, and the
    Arrow eval only parses the fake header."""
    plan = formatted_plan(SPECS["mm_metadata"].fn(spark, sf_dir))
    assert "md5(payload" in plan and "length(payload" in plan


def test_bruteforce_broadcast_is_bounded(spark, sf_dir):
    """The exact ANN must never broadcast an unbounded query side: with
    a small batch the plan splits into one bounded BroadcastExchange
    per id-hash slice; with the default batch (>= |Q| here) exactly
    one. Either way, no shuffle join of the corpus side appears."""
    import re

    from mapreduce_framework_in_go_spark.operators import similarity

    from mapreduce_framework_in_go_spark.sources.tables import parquet_num_rows

    emb = similarity._emb(spark, sf_dir)
    n_rows = parquet_num_rows(sf_dir, "embeddings")  # footer, no job
    small = formatted_plan(similarity._bruteforce_topk(emb, 5, n_rows, batch=4))
    n_q = -(-n_rows // similarity.QUERY_MOD)
    want = -(-n_q // 4)
    assert len(re.findall(r"\(\d+\) BroadcastExchange", small)) == want
    default = formatted_plan(similarity._bruteforce_topk(emb, 5, n_rows))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", default)) == 1


def test_pack_sequences_no_global_window(spark, sf_dir):
    """The corpus-side cumsum window must be hash-partitioned by
    range-group; the only single-partition work is the tiny
    group-offset frame (one row per PACK_GROUP_SPAN of id space)."""
    import re

    plan = formatted_plan(SPECS["pack_sequences"].fn(spark, sf_dir))
    hashed = re.findall(r"hashpartitioning\(g#", plan)
    assert hashed, "corpus window should partition by range-group g"
    # group offsets ride a broadcast join, not a corpus-wide shuffle
    assert "BroadcastHashJoin" in plan


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    """The eval n-gram set must broadcast: the corpus-side scan joins
    map-side, the only Exchange left is the per-doc hit count."""
    plan = formatted_plan(SPECS["decontaminate_ngram"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_basket_pairs_topk_and_partial_agg(spark, sf_dir):
    """Pair counting must map-side combine, and the top-100 must be
    TakeOrdered — never a global sort of the pair space."""
    plan = formatted_plan(SPECS["basket_part_pairs"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_pagerank_no_cartesian_broadcast_constants(spark, sf_dir):
    """Every iteration's constants (node count, teleport base) must ride
    broadcasts, and the rank propagation must stay equi-join. The only
    nested loops allowed are BroadcastNestedLoopJoin — the 1-row
    constant attachments — never an unbroadcast CartesianProduct."""
    plan = formatted_plan(SPECS["supplier_pagerank"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    import re

    nlj = re.findall(r"\(\d+\) (\w*NestedLoop\w*)", plan)
    assert all(j == "BroadcastNestedLoopJoin" for j in nlj)


def test_merge_upsert_is_single_keyed_join(spark, sf_dir):
    """MERGE = one keyed join plus the insert union; the 1-row max
    offset rides a BroadcastNestedLoopJoin (a broadcast scalar), and no
    unbroadcast CartesianProduct may appear."""
    plan = formatted_plan(SPECS["merge_upsert_orders"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    import re

    nlj = re.findall(r"\(\d+\) (\w*NestedLoop\w*)", plan)
    assert all(j == "BroadcastNestedLoopJoin" for j in nlj)


def test_global_sort_rank_two_level(spark, sf_dir):
    """The terasort-style global rank must sort via RangePartitioning
    and compute positions two-level (per-range-partition row_number +
    broadcast prefix offsets): the only SinglePartition exchange in the
    plan belongs to the tiny per-partition count frame — the full data
    never funnels through one partition."""
    plan = formatted_plan(SPECS["global_sort_rank"].fn(spark, sf_dir))
    assert "rangepartitioning" in plan
    assert "hashpartitioning(pid" in plan  # big-side window keyed by pid
    assert plan.count("SinglePartition") <= 2  # offsets frame only
    assert "BroadcastHashJoin" in plan  # offsets ride a broadcast
    # both branches must read ONE materialized range partitioning —
    # independently sampled exchanges could disagree on boundaries
    assert "InMemoryTableScan" in plan


def test_text_repetition_shuffle_free(spark, sf_dir):
    """All repetition stats are computed inside the staged shingle
    array — the plan must be scan -> generate -> project with zero
    exchanges (partitioned exactly like the input at any scale)."""
    import re

    plan = formatted_plan(SPECS["text_repetition"].fn(spark, sf_dir))
    assert not re.findall(r"\(\d+\) Exchange", plan)
    assert "Generate" in plan  # the explode(array(...)) staging


def test_ivf_assignment_is_map_only(spark, sf_dir):
    """The n=1 cell assignment (Lloyd rounds, IVF members) must not
    window-shuffle N*k scored rows: ann_ivf's plan may contain no
    window-function Exchange on vec_id — only the probe-side window
    (query_id) and the final rank remain."""
    import re

    plan = formatted_plan(SPECS["ann_ivf"].fn(spark, sf_dir))
    assert not re.search(r"hashpartitioning\(vec_id#", plan), (
        "corpus-side assignment should be the broadcast argmax fold, "
        "not a window shuffle on vec_id"
    )


def test_bloom_probe_is_broadcast_only(spark, sf_dir):
    """The bloom stage must reach the fact side as a broadcast (1-row
    word map via BroadcastNestedLoopJoin) — never a shuffle of
    lineitem before the prune filter."""
    plan = formatted_plan(SPECS["bloom_prune_join"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # the only exchanges: bloom build aggs + final groupBy, all tiny
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    li = [ln for ln in read if "l_orderkey" in ln][0]
    assert "l_shipdate" not in li  # fact scan pruned to needed columns


def test_boilerplate_candidates_broadcast_and_single_pandas_stage(spark, sf_dir):
    """Candidate restriction must be a broadcast join (candidates are
    bounded by MG capacity x partitions) and the sketch runs in ONE
    MapInPandas stage over the un-shuffled occurrence stream."""
    import re

    plan = formatted_plan(SPECS["boilerplate_ngrams"].fn(spark, sf_dir))
    nodes = [
        ln for ln in plan.splitlines() if re.match(r"^\(\d+\) MapInPandas", ln)
    ]
    assert len(nodes) == 1
    assert "BroadcastHashJoin" in plan


def test_curriculum_assignment_no_global_window(spark, sf_dir):
    """Decile assignment must be a broadcast compare, not ntile: no
    Window operator anywhere in the plan."""
    plan = formatted_plan(SPECS["curriculum_bins"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row boundary frame


def test_anomaly_stats_broadcast(spark, sf_dir):
    """Per-type stats (rows = event types) must broadcast back onto the
    hourly rollup."""
    plan = formatted_plan(SPECS["event_anomaly_hours"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_shuffle_free(spark, sf_dir):
    """Passage chunking must stay a scan -> generate -> project map:
    zero exchanges, partitioned like the input at any corpus size."""
    plan = formatted_plan(SPECS["chunk_documents"].fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_skew_topkeys_takeordered(spark, sf_dir):
    """The heavy-key rank must be TakeOrdered over per-key counts —
    never a global sort of the key domain."""
    plan = formatted_plan(SPECS["skew_topkeys"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_pq_encode_broadcasts_seeds(spark, sf_dir):
    """PQ encoding must meet the codebook map-side — since r13 as ONE
    MapInPandas stage over the corpus scan (the codebook travels as a
    Python broadcast; numpy int64 argmin is bitwise equal to the old
    fold) — and the ADC lookup table must still reach scoring via a
    BROADCAST join. A shuffled seed join would move the corpus per
    subspace."""
    plan = formatted_plan(SPECS["ann_pq"].fn(spark, sf_dir))
    assert "MapInPandas" in plan  # the r13 vectorized encode stage
    assert "BroadcastExchange" in plan  # the LUT join
    assert "CartesianProduct" not in plan


def test_resample_pre_aggregates_before_window(spark, sf_dir):
    """The ffill window must run on the hourly pre-aggregate grid, not
    raw events: the plan's first aggregate keys (user_id, hour) so a
    skewed user costs span-hours rows, not their raw event count."""
    plan = formatted_plan(SPECS["resample_gapfill"].fn(spark, sf_dir))
    assert "date_trunc" in plan
    # partial + final hash aggregate for the hourly collapse
    assert plan.count("HashAggregate") >= 2
    # the per-user window exists and is keyed (never unpartitioned)
    assert "SinglePartition" not in plan


def test_zorder_single_scan_per_layout_no_extra_exchange(spark, sf_dir):
    """Z-value and bucket assignment must be map-side: the only
    exchanges are the two layout aggregations; bounds ride a broadcast
    1-row aggregate, never a driver action."""
    plan = formatted_plan(SPECS["zorder_layout"].fn(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_trailing_distinct_range_frame(spark, sf_dir):
    """The sketch merge must use a RANGE frame over clock hours (a
    rows frame would widen across gaps), and the expand side must
    carry the width/slide fan-out through a Generate."""
    plan = formatted_plan(SPECS["trailing_distinct_users"].fn(spark, sf_dir))
    assert "RangeFrame, -2, currentrow" in plan
    assert "Generate" in plan


def test_c4_line_scrub_shuffle_free(spark, sf_dir):
    """C4 cleaning is per-document map work: the plan must contain NO
    Exchange, and the shared HOF-derived arrays (tagged tokens, lines,
    kept+flags) must each be staged behind a Generate so project
    collapse cannot re-inline them per consumer."""
    plan = formatted_plan(SPECS["c4_line_scrub"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert plan.count("Generate") >= 3


def test_cms_sketch_broadcast_and_partial_agg(spark, sf_dir):
    """The count-min build must map-side combine (partial + final
    HashAggregate over the D*W cells) and the dense 1-row sketch must
    reach the probe side as a broadcast (BroadcastNestedLoopJoin), so
    the only full-stream exchange carries sketch-sized partials."""
    plan = formatted_plan(SPECS["cms_heavy_hitters"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("HashAggregate") >= 4  # cells + counts, partial+final
    assert "CartesianProduct" not in plan


def test_substring_spans_two_shuffles_no_join(spark, sf_dir):
    """The ExactSubstr pass must decide duplicated grams INSIDE the
    gram-partitioned window (min/max doc_id) — never a self-join or a
    join-back on the gram — and the island aggregation must reuse the
    doc_id window's partitioning: exactly two exchanges end to end."""
    import re

    plan = formatted_plan(SPECS["dedup_substring_spans"].fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Window") >= 2


def test_bpe_argmax_is_takeordered_and_plans_stay_linear(spark, sf_dir):
    """Each rank's argmax must plan a TakeOrdered over the persisted
    word table (never a global sort, never a fresh corpus scan), the
    rank-N word table's plan must stay LINEAR in the rank (the
    join-based application embedded each round's subtree twice — 2^N
    plan blowup), and the learned-merge artifact itself must read
    driver-resident (no corpus rescan to consume the table)."""
    import re

    from mapreduce_framework_in_go_spark.operators import bpe
    from mapreduce_framework_in_go_spark.sources.tables import table

    _learned, w_final = bpe.merge_chain_from(table(spark, sf_dir, "documents"))
    probe = formatted_plan(bpe.pair_argmax_frame(w_final))
    assert "TakeOrderedAndProject" in probe
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", probe)
    assert sum(1 for n in nodes if n == "Scan") <= 1
    final_plan = formatted_plan(w_final)
    # linear growth: the whole rank-N lineage is a few dozen nodes, not 2^N
    assert len(re.findall(r"\(\d+\) ", final_plan)) < 40
    merges = formatted_plan(SPECS["bpe_learn_merges"].fn(spark, sf_dir))
    assert "ExistingRDD" in merges or "LocalTableScan" in merges
    assert "Scan parquet" not in merges


def test_gopher_repetition_interval_fold_shape(spark, sf_dir):
    """The r9 rewrite's contract: every repetition statistic is a
    function of ONE document, so the plan is pure map work — ZERO
    exchanges, no joins, a single documents scan. Duplicate detection
    is sorted-neighbor equality per row and coverage is the
    interval-union aggregate HOF, both in the projection."""
    import re

    plan = formatted_plan(SPECS["gopher_repetition_flags"].fn(spark, sf_dir))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    # at most the single-split parallelism rescue (a round-robin
    # repartition of the raw doc rows that only fires when the local
    # scan yields too few input splits); never a key shuffle
    assert n_exchanges <= 1, f"{n_exchanges} exchanges — map-only shape regressed"
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert "aggregate(" in plan  # the JVM-side interval fold
    assert "Cartesian" not in plan
