"""Semantics + plan-shape tests for the language-model statistics
(operators/langmodel.py) and the UDTF/UDAF extension queries
(operators/udx.py). Oracle parity is the driver gate; these pin the
model properties and the physical shapes."""

import math

from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.plans import formatted_plan
from mapreduce_framework_in_go_spark.registry import all_queries

SPECS = all_queries()

DISCOUNT = 0.75


def test_kn_bigrams_is_a_probability_distribution(spark, sf_dir):
    """Interpolated KN must sum to exactly 1 over the FULL vocab for
    every context: observed rows carry their p_kn; the unobserved
    continuation mass is lambda(u) * (B - sum_observed N1+(.v)) / B.
    Reconstructing that from the emitted table must give ~1."""
    rows = SPECS["lm_kn_bigrams"].fn(spark, sf_dir).collect()
    total_types = len(rows)
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.w1, []).append(r)
    assert len(by_ctx) >= 10
    for w1, group in by_ctx.items():
        c_ctx, nf = group[0].c_ctx, group[0].n_follow_types
        assert sum(g.c for g in group) == c_ctx
        assert len(group) == nf
        lam = DISCOUNT * nf / c_ctx
        observed = sum(g.p_kn for g in group)
        unobserved = lam * (total_types - sum(g.n_precede_types for g in group)) / total_types
        # round-6 on each of nf rows bounds the reconstruction error
        assert abs(observed + unobserved - 1.0) < 5e-6 * max(nf, 1) + 1e-9


def test_kn_bigrams_plan_shape(spark, sf_dir):
    """The corpus-sized bigram count must combine map-side; every
    derived-statistic join must broadcast (the count table is
    vocab^2-bounded, never worth a shuffle)."""
    plan = formatted_plan(SPECS["lm_kn_bigrams"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final count
    assert plan.count("BroadcastHashJoin") >= 3  # ctx, back, tot
    assert "SortMergeJoin" not in plan


def test_next_token_top3_ranks(spark, sf_dir):
    rows = SPECS["lm_next_token_top3"].fn(spark, sf_dir).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.w1, []).append(r)
    for w1, group in by_ctx.items():
        group.sort(key=lambda r: r.rk)
        assert [g.rk for g in group] == list(range(1, len(group) + 1))
        assert len(group) <= 3
        # counts non-increasing; ties broken by token ascending
        for a, b in zip(group, group[1:]):
            assert a.c > b.c or (a.c == b.c and a.next_token < b.next_token)


def test_perplexity_bounds_and_consistency(spark, sf_dir):
    """Unigram cross-entropy is bounded by log(vocab-type count) for
    any doc (max NLL token is the rarest type); ppl == exp(H)."""
    rows = SPECS["doc_perplexity"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    assert len(rows) == n_docs or len(rows) == n_docs - docs.where(
        F.size(F.split("text", r"[^\p{L}]+")) == 0
    ).count()
    n_types = (
        docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("w"))
        .where(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    total = (
        docs.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("w"))
        .where(F.col("w") != "")
        .count()
    )
    max_nll = math.log(total)  # rarest possible type has count 1
    for r in rows:
        assert 0.0 < r.cross_entropy <= max_nll + 1e-6
        assert abs(r.perplexity - math.exp(r.cross_entropy)) < 1e-3
        assert r.perplexity <= total + 1
        assert r.n_tokens > 0
    # a corpus of repeated common tokens can't be harder than uniform
    assert min(r.perplexity for r in rows) <= n_types


def test_perplexity_broadcasts_unigram_table(spark, sf_dir):
    plan = formatted_plan(SPECS["doc_perplexity"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_udtf_positions_match_builtin_tokenizer(spark, sf_dir):
    """The Python UDTF tokenizer must agree with the JVM letter-run
    contract (functions/text.py) doc by doc, position by position."""
    from mapreduce_framework_in_go_spark.functions.text import tokens_col
    from mapreduce_framework_in_go_spark.operators.udx import UDTF_DOC_LIMIT
    from mapreduce_framework_in_go_spark.sources.tables import table

    got = {}
    for r in SPECS["udtf_token_positions"].fn(spark, sf_dir).collect():
        got.setdefault(r.doc_id, {})[r.pos] = r.token
    want = {
        r.doc_id: r.toks
        for r in table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < UDTF_DOC_LIMIT)
        .select("doc_id", tokens_col("text").alias("toks"))
        .collect()
    }
    assert set(got) == {d for d, toks in want.items() if toks}
    for doc_id, toks in want.items():
        if not toks:
            continue
        positions = got[doc_id]
        assert sorted(positions) == list(range(len(toks)))
        assert [positions[i] for i in range(len(toks))] == list(toks)


def test_udaf_median_uses_pandas_aggregate_path(spark, sf_dir):
    """The grouped-agg pandas UDF must plan the Arrow whole-group
    aggregate (ArrowAggregatePython in Spark 4), and the median must
    equal the exact midpoint for every group."""
    import statistics

    df = SPECS["udaf_median_acctbal"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
    rows = {r.c_nationkey: r for r in df.collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    by_nation = {}
    for c in cust:
        by_nation.setdefault(c.c_nationkey, []).append(c.c_acctbal)
    assert set(rows) == set(by_nation)
    for nk, vals in by_nation.items():
        assert rows[nk].n_customers == len(vals)
        assert abs(rows[nk].median_acctbal - statistics.median(vals)) < 1e-6


def test_zipf_fit_matches_duckdb_regression(spark, sf_dir, duck):
    """The integer-grid OLS must agree with DuckDB's regr_slope/regr_r2
    on the raw (un-gridded) logs to ~1e-6, and the synthetic word-salad
    corpus must read as NON-Zipfian (near-uniform frequencies: shallow
    slope, low r^2) — the health signal working as intended."""
    row = SPECS["zipf_fit_tokens"].fn(spark, sf_dir).collect()[0]
    want = duck.execute(
        r"""
        WITH tok AS (SELECT unnest(regexp_extract_all(text, '[\p{L}]+')) AS w
                     FROM documents),
        uni AS (SELECT w, count(*) cw FROM tok GROUP BY 1),
        ranked AS (SELECT cw, row_number() OVER (ORDER BY cw DESC, w) rk
                   FROM uni)
        SELECT count(*), sum(cw), regr_slope(ln(cw), ln(rk)),
               regr_r2(ln(cw), ln(rk))
        FROM ranked
        """
    ).fetchone()
    assert row.n_types == want[0]
    assert row.total_tokens == want[1]
    assert abs(row.zipf_slope - want[2]) < 1e-5
    assert abs(row.r2 - want[3]) < 1e-5
    assert -0.6 < row.zipf_slope < 0  # near-uniform, nothing like -1
    assert row.r2 < 0.5


def test_zipf_rank_is_two_level(spark, sf_dir):
    """The vocab rank must be the terasort two-level shape
    (RangePartitioning + per-partition row_number + broadcast
    prefix-sum), never a single-partition window over the full
    unigram vocabulary — 10^8+ types at web scale (VERDICT r11 #1)."""
    from mapreduce_framework_in_go_spark.plans import formatted_plan

    plan = formatted_plan(SPECS["zipf_fit_tokens"].fn(spark, sf_dir))
    assert "rangepartitioning" in plan.lower()


def test_kn_doc_perplexity_matches_independent_model(spark, sf_dir):
    """doc_perplexity_kn vs an independent Python KN fold built from
    the (already distribution-verified) lm_kn_bigrams table: for every
    doc, the mean of per-bigram grid-snapped ln P_KN must reproduce
    the reported cross-entropy, and perplexity = exp(H)."""
    import re

    import pyarrow.parquet as pq

    LOG_SCALE = 10**9
    kn = {
        (r.w1, r.w2): (r.c, r.c_ctx, r.n_follow_types, r.n_precede_types)
        for r in SPECS["lm_kn_bigrams"].fn(spark, sf_dir).collect()
    }
    b_total = len(kn)
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy_kn, r.perplexity_kn)
        for r in SPECS["doc_perplexity_kn"].fn(spark, sf_dir).collect()
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    checked = 0
    for d in docs:
        toks = re.findall(r"[^\W\d_]+", d["text"])
        if len(toks) < 2:
            assert d["doc_id"] not in got
            continue
        s = 0
        for u, v in zip(toks, toks[1:]):
            c, c_ctx, nf, nb = kn[(u, v)]
            p = (c - DISCOUNT) / c_ctx + DISCOUNT * nf / c_ctx * (
                nb * 1.0 / b_total
            )
            s += round(math.log(p) * LOG_SCALE)
        n = len(toks) - 1
        h = -(s * 1.0 / LOG_SCALE) / n
        exp = (n, round(h, 6), round(math.exp(h), 6))
        assert got[d["doc_id"]] == exp, (d["doc_id"], got[d["doc_id"]], exp)
        checked += 1
    assert checked == len(got)


def test_ccnet_buckets_are_balanced_thirds(spark, sf_dir):
    """Within every source the head/middle/tail buckets differ by at
    most one doc, cover all scored docs, and head holds the lowest
    cross-entropy slice (the CCNet contract)."""
    from mapreduce_framework_in_go_spark.operators.langmodel import (
        perplexity_ccnet_buckets,
    )

    rows = perplexity_ccnet_buckets(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) > 1
    for src, rs in by_src.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r.ppl_bucket] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (src, sizes)
        head_max = max(
            (r.cross_entropy for r in rs if r.ppl_bucket == "head"),
            default=None,
        )
        tail_min = min(
            (r.cross_entropy for r in rs if r.ppl_bucket == "tail"),
            default=None,
        )
        if head_max is not None and tail_min is not None:
            assert head_max <= tail_min, src
