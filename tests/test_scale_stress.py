"""Scale-stress: flagship dedup paths on a ~11x salted sf0.1 corpus.

SCALE.md's 100x claims ride three properties: exact-collapse caps
identical-text skew BEFORE any sketch; candidate generation is bucketed
(LSH bands, gram partitions) so no stage touches the quadratic pair
space; and per-partition state stays constant even when one gram/digest
is mega-hot. This module is the first empirical datapoint beyond
sf0.1: a 55,500-doc corpus — 10 exact salted copies of every sf0.1
document (a 10-wide identical-text crowd per doc, the skew adversary)
plus a planted near-dup variant for every 10th — and asserts each
flagship path completes inside a wall-clock budget AND preserves its
semantic invariants:

- dedup_clusters_lsh: every copy crowd lands in ONE cluster (expansion
  through exact-collapse), planted variants join their base's cluster
  through the MinHash bands (recall >= 95%).
- dedup_substring_scrub: every later copy is scrubbed to zero kept
  tokens (its every window occurs in the earlier original).
- dedup_span_lcs: identical (base, copy) pairs report the full
  document as their longest shared run.
- ann_ivfpq: on a 20,000-vector salted embeddings corpus, the whole
  IVFADC chain (train, encode, probe, ADC-score) completes in budget
  and every query's exact-copy family occupies ranks 1..9 with ONE
  shared integer score (the integer-exactness invariant at 10x).

Marked ``slow`` (~2-4 min on local[8]); skipped when sf0.1 testdata is
absent.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_in_go_spark.functions.text import tokens_col
from mapreduce_framework_in_go_spark.operators.dedup import dedup_clusters_lsh
from mapreduce_framework_in_go_spark.operators.spans import (
    SPAN_W,
    dedup_span_lcs,
    dedup_substring_scrub,
)

pytestmark = pytest.mark.slow

SF01 = "/root/testdata/sf0.1"
COPIES = 10
COPY_STRIDE = 10_000_000  # copy k of doc d gets doc_id d + k*STRIDE
VARIANT_BASE = 100_000_000  # near-dup variant of doc d: d + VARIANT_BASE
# Per-path wall budget: generous on a loaded CI box, still a hard stop
# for the quadratic blowups this suite exists to catch.
WALL_BUDGET_S = 240.0


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    out = str(tmp_path_factory.mktemp("scale") / "big")
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    cols = ["lang", "source", "n_chars"]
    frames = [
        docs.select(
            (F.col("doc_id") + k * COPY_STRIDE).alias("doc_id"), "text", *cols
        )
        for k in range(COPIES)
    ]
    # One unseen trailing token: 3-gram shingle Jaccard ~ (n-2)/(n-1)
    # ~= 0.98 against the base doc — above the 0.7 verify threshold and
    # detected by a 4x4 band scheme with p ~ 1 - (1 - 0.98^4)^4 > 0.9999.
    frames.append(
        docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + VARIANT_BASE).alias("doc_id"),
            F.concat("text", F.lit(" zqxv")).alias("text"),
            *cols,
        )
    )
    corpus = frames[0]
    for fr in frames[1:]:
        corpus = corpus.unionByName(fr)
    corpus.repartition(8).write.parquet(f"{out}/documents.parquet")
    return out


def _timed(frame_builder):
    t0 = time.monotonic()
    result = frame_builder()
    elapsed = time.monotonic() - t0
    assert elapsed < WALL_BUDGET_S, f"blew the wall budget: {elapsed:.0f}s"
    return result


def test_clusters_lsh_copies_coclustered(spark, big_dir):
    # The budget must cover the BUILD, not just the final aggregate:
    # the star-contraction rounds run eager corpus-scale convergence
    # probes inside dedup_clusters_lsh itself — the phase a quadratic
    # regression would blow up.
    def _build_and_agg():
        rows = dedup_clusters_lsh(spark, big_dir).persist()
        agg = rows.agg(
            F.sum((F.col("doc_id") < VARIANT_BASE).cast("long")).alias(
                "n_copies"
            ),
            F.min("cluster_size").alias("min_size"),
        ).first()
        return rows, agg

    rows, agg = _timed(_build_and_agg)
    try:
        # Every one of the 50k exact-copy docs is clustered (its crowd
        # is >= 10 wide), and no cluster is smaller than one crowd.
        assert agg["n_copies"] == COPIES * 5000
        assert agg["min_size"] >= COPIES
        # Exact copies of one base doc NEVER split across clusters —
        # the expand-through-digest join, under 10x skew.
        split = (
            rows.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("base"))
            .agg(F.count_distinct("cluster_rep").alias("n_labels"))
            .where(F.col("n_labels") > 1)
            .count()
        )
        assert split == 0
        # Planted variants reach their base's cluster through the bands.
        base_label = rows.where(F.col("doc_id") < COPY_STRIDE).select(
            F.col("doc_id").alias("base"),
            F.col("cluster_rep").alias("base_rep"),
        )
        n_variants = 500
        n_joined = (
            rows.where(F.col("doc_id") >= VARIANT_BASE)
            .select((F.col("doc_id") - VARIANT_BASE).alias("base"), "cluster_rep")
            .join(base_label, "base")
            .where(F.col("cluster_rep") == F.col("base_rep"))
            .count()
        )
        assert n_joined >= 0.95 * n_variants
    finally:
        rows.unpersist()


def test_substring_scrub_copies_fully_scrubbed(spark, big_dir):
    res = dedup_substring_scrub(spark, big_dir).persist()
    try:
        agg = _timed(
            lambda: res.where(
                F.col("doc_id").between(COPY_STRIDE, VARIANT_BASE - 1)
                & (F.col("n_tokens") >= SPAN_W)
            ).agg(
                F.count("*").alias("n"),
                F.sum((F.col("kept_tokens") != 0).cast("long")).alias("n_kept"),
            ).first()
        )
        # Every window of a later copy occurs in the earlier original,
        # so keep-earliest scrubs the copy to nothing.
        assert agg["n"] >= 9 * 4500
        assert agg["n_kept"] == 0
        # Global ledger arithmetic holds for every doc.
        bad = res.where(
            F.col("kept_tokens") + F.col("removed_tokens") != F.col("n_tokens")
        ).count()
        assert bad == 0
    finally:
        res.unpersist()


def test_span_lcs_identical_pairs_full_run(spark, big_dir):
    res = dedup_span_lcs(spark, big_dir).persist()
    try:
        ntok = (
            spark.read.parquet(f"{big_dir}/documents.parquet")
            .where(F.col("doc_id") < COPY_STRIDE)
            .select(
                F.col("doc_id").alias("doc_a"),
                F.size(tokens_col("text")).cast("long").alias("n_tokens"),
            )
        )
        pairs = res.where(
            (F.col("doc_a") < COPY_STRIDE)
            & (F.col("doc_b") == F.col("doc_a") + COPY_STRIDE)
        ).join(ntok, "doc_a")
        agg = _timed(
            lambda: pairs.agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("lcs_tokens") == F.col("n_tokens")).cast("long")
                ).alias("n_full"),
                F.min("lcs_tokens").alias("min_lcs"),
            ).first()
        )
        # An identical (base, copy) pair is one unbroken diagonal run
        # spanning the whole document; a handful of docs may lose a
        # gram to the df cap when they collide with a planted-near-dup
        # family, hence >= 99% rather than all.
        assert agg["n"] >= 4500
        assert agg["n_full"] >= 0.99 * agg["n"]
        assert agg["min_lcs"] >= SPAN_W
    finally:
        res.unpersist()


# --- ANN stress: the production similarity path under 10x vector dup ---

EMB_COPIES = 10
EMB_STRIDE = 10_000_000


@pytest.fixture(scope="module")
def big_emb_dir(spark, tmp_path_factory):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    out = str(tmp_path_factory.mktemp("scale_emb") / "big")
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    frames = [
        emb.select(
            (F.col("vec_id") + k * EMB_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        for k in range(EMB_COPIES)
    ]
    corpus = frames[0]
    for fr in frames[1:]:
        corpus = corpus.unionByName(fr)
    corpus.repartition(8).write.parquet(f"{out}/embeddings.parquet")
    return out


def test_ivfpq_copy_families_dominate_topk(spark, big_emb_dir):
    """ann_ivfpq on a 20,000-vector corpus of 10 exact copies per sf0.1
    vector: the whole IVFADC chain — Lloyd training, residual encoding,
    probing, ADC scoring — runs at 10x the bench SF inside the wall
    budget, and the integer-exact scoring shows: a query's 9 exact
    copies share its cell, its residual codes, and therefore ONE exact
    integer score, the maximum in the neighborhood (every non-copy
    cosine is <= ~0.51 vs the copies' 1.0 — far beyond what PQ error
    can bridge) — so ranks 1..9 of every query are exactly its copy
    family, ordered by neighbor_id (the deterministic tie-break)."""
    from mapreduce_framework_in_go_spark.registry import all_queries

    t0 = time.monotonic()
    rows = all_queries()["ann_ivfpq"].fn(spark, big_emb_dir).collect()
    elapsed = time.monotonic() - t0
    assert elapsed < WALL_BUDGET_S, f"blew the wall budget: {elapsed:.0f}s"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # every query slice of the corpus is a query vector (k*STRIDE % 50
    # == 0 keeps copies of queries queries too)
    assert len(by_q) == 20_000 // 50
    for q, rs in by_q.items():
        fam = {q % EMB_STRIDE + k * EMB_STRIDE for k in range(EMB_COPIES)}
        fam.discard(q)
        top9 = sorted(rs, key=lambda r: r.rank)[:9]
        assert {r.neighbor_id for r in top9} == fam, q
        # equal scores => rank order is the neighbor_id tie-break
        assert [r.neighbor_id for r in top9] == sorted(fam), q
        assert len({r.score_scaled for r in top9}) == 1, q


def test_semdedup_copy_families_pruned(spark, big_emb_dir):
    """semdedup_prune on the 20,000-vector salted corpus: within every
    10-wide exact-copy family the members share cent_cos (identical
    vector), so the family's min-vec_id member precedes the other nine
    in (cent_cos, vec_id) order with pairwise cosine 1.0 >= tau —
    every non-min member MUST be pruned, whatever the cross-family
    pairs do. The within-cell pair volume at 10x duplication (~30x the
    bench SF) must stay inside the wall budget — the sum(n_c^2) cost
    model under the skew adversary."""
    from mapreduce_framework_in_go_spark.operators.semdedup import (
        semdedup_prune,
    )

    t0 = time.monotonic()
    res = semdedup_prune(spark, big_emb_dir).persist()
    try:
        agg = res.agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum(
                (
                    (F.col("vec_id") >= EMB_STRIDE) & F.col("keep")
                ).cast("long")
            ).alias("bad_copy_kept"),
        ).first()
        elapsed = time.monotonic() - t0
        assert elapsed < WALL_BUDGET_S, f"blew the wall budget: {elapsed:.0f}s"
        assert agg["n"] == 20_000
        # copies (vec_id >= STRIDE) always have their base (min vec_id
        # of the family) preceding them at cosine 1.0 -> all pruned
        assert agg["bad_copy_kept"] == 0
        # survivors are a subset of the 2000 family minima
        assert 1 <= agg["n_kept"] <= 2_000
        # every family's min member carries the family verdict exactly
        # once: families never split across cells (identical vectors
        # share the argmax cell deterministically)
        fam_cells = (
            res.groupBy((F.col("vec_id") % EMB_STRIDE).alias("base"))
            .agg(F.count_distinct("cell_id").alias("n_cells"))
            .where(F.col("n_cells") > 1)
            .count()
        )
        assert fam_cells == 0
    finally:
        res.unpersist()


# --- selection + classification stress (VERDICT r5 ask #5): the two
# round-5 families the salted-corpus suite did not yet cover ---


def test_dsir_copy_families_share_weights(spark, big_dir):
    """dsir_weights on the 55,500-doc salted corpus: a document's
    importance weight is a pure function of its text (token buckets x
    the corpus-level log-ratio table), so the 10 exact copies of every
    base doc MUST carry one identical w_scaled — under 10x duplication
    the bucket model shifts, but it shifts identically for every family
    member. The B-bounded model build + broadcast scoring join must
    stay inside the wall budget (the whole path is one explode + two
    groupBys — nothing here may go quadratic)."""
    from mapreduce_framework_in_go_spark.operators.dsir import (
        DSIR_TARGET,
        dsir_weights,
    )

    def _build_and_agg():
        w = dsir_weights(spark, big_dir).persist()
        fam = (
            w.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("base"))
            .agg(
                F.count("*").alias("n"),
                F.count_distinct("w_scaled").alias("n_w"),
                F.count_distinct("n_tokens").alias("n_nt"),
            )
        )
        agg = fam.agg(
            F.count("*").alias("n_fams"),
            F.sum((F.col("n") == COPIES).cast("long")).alias("full_fams"),
            F.max("n_w").alias("max_w_variants"),
            F.max("n_nt").alias("max_nt_variants"),
        ).first()
        return w, agg

    w, agg = _timed(_build_and_agg)
    try:
        # every non-target base contributes a full 10-copy family
        n_raw_bases = (
            spark.read.parquet(f"{big_dir}/documents.parquet")
            .where(
                (F.col("doc_id") < COPY_STRIDE)
                & (F.col("source") != DSIR_TARGET)
            )
            .count()
        )
        assert agg["n_fams"] == n_raw_bases
        assert agg["full_fams"] == n_raw_bases
        # the family-invariance core: one weight, one token count
        assert agg["max_w_variants"] == 1
        assert agg["max_nt_variants"] == 1
    finally:
        w.unpersist()


def test_nb_copy_families_share_verdicts(spark, big_dir):
    """The hashed-NB classifier on the salted corpus: scores depend
    only on (text, the trained model), so every holdout member of a
    10-copy family (copies straddle folds — +k*COPY_STRIDE walks
    doc_id mod 7) must receive the IDENTICAL prediction and margin.
    The (C x 1024)-bounded model and the broadcast scoring join are
    what keep 10x duplication inside the wall budget."""
    from mapreduce_framework_in_go_spark.operators.classifier import (
        nb_doc_margin,
    )

    def _build_and_agg():
        m = nb_doc_margin(spark, big_dir).persist()
        fam = (
            m.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("base"))
            .agg(
                F.count("*").alias("n"),
                F.count_distinct("pred_source").alias("n_pred"),
                F.count_distinct("margin_scaled").alias("n_margin"),
                F.count_distinct("top_score_scaled").alias("n_top"),
            )
        )
        agg = fam.agg(
            F.count("*").alias("n_fams"),
            F.max("n_pred").alias("max_pred"),
            F.max("n_margin").alias("max_margin"),
            F.max("n_top").alias("max_top"),
            F.sum("n").alias("n_scored"),
        ).first()
        return m, agg

    m, agg = _timed(_build_and_agg)
    try:
        # copies walk doc_id mod 7 by 3 per stride step (10^7 % 7 == 3,
        # coprime walk), so every 10-copy family has holdout members —
        # all 5000 bases appear, each with identical verdicts
        assert agg["n_fams"] == 5000
        assert agg["max_pred"] == 1
        assert agg["max_margin"] == 1
        assert agg["max_top"] == 1
        # and the holdout roster is exactly the mod-7 arithmetic over
        # the actual base ids (generator-independent)
        base_ids = [
            r.doc_id
            for r in spark.read.parquet(f"{big_dir}/documents.parquet")
            .where(F.col("doc_id") < COPY_STRIDE)
            .select("doc_id")
            .collect()
        ]
        expected = sum(
            1
            for d in base_ids
            for k in range(COPIES)
            if (d + k * COPY_STRIDE) % 7 == 0
        )
        assert agg["n_scored"] == expected
    finally:
        m.unpersist()


# --- scrub/audit stress (VERDICT r7 ask #7 / r8 ask #5): the release
# scrub + split-governance family under 10x exact duplication ---


def test_pii_scrub_copy_families_share_verdicts(spark, big_dir):
    """pii_scrub is a pure function of the text, so every 10-copy
    family must share ONE (n_email, n_ip, n_phone, scrubbed_md5)
    verdict under 10x duplication — and the whole pass is map work, so
    the salted corpus costs exactly 10x the scan, nothing superlinear."""
    from mapreduce_framework_in_go_spark.registry import all_queries

    def _build_and_agg():
        res = all_queries()["pii_scrub"].fn(spark, big_dir).persist()
        fam = (
            res.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("base"))
            .agg(
                F.count("*").alias("n"),
                F.count_distinct(
                    "n_email", "n_ip", "n_phone", "scrubbed_md5"
                ).alias("n_verdicts"),
            )
        )
        agg = fam.agg(
            F.count("*").alias("n_fams"),
            F.sum((F.col("n") == COPIES).cast("long")).alias("full_fams"),
            F.max("n_verdicts").alias("max_verdicts"),
        ).first()
        return res, agg

    res, agg = _timed(_build_and_agg)
    try:
        assert agg["n_fams"] == 5000
        assert agg["full_fams"] == 5000
        assert agg["max_verdicts"] == 1
    finally:
        res.unpersist()


def test_boilerplate_scrub_salted_corpus_all_hot(spark, big_dir):
    """boilerplate_line_scrub under the skew adversary: 10 exact copies
    make EVERY line of every copied document cross-document-hot
    (df >= 10 >= the threshold), so every copy must scrub to zero kept
    lines with the empty-text digest — the hot-set join stays bounded
    even when the whole corpus is boilerplate. Planted variants differ
    from their base only in the final line, so they keep AT MOST that
    one line."""
    import hashlib

    from mapreduce_framework_in_go_spark.registry import all_queries

    def _build_and_agg():
        res = all_queries()["boilerplate_line_scrub"].fn(
            spark, big_dir
        ).persist()
        agg = res.agg(
            F.sum(
                (
                    (F.col("doc_id") < VARIANT_BASE)
                    & (F.col("n_kept_lines") != 0)
                ).cast("long")
            ).alias("bad_copies"),
            F.sum(
                (
                    (F.col("doc_id") >= VARIANT_BASE)
                    & (F.col("n_kept_lines") > 1)
                ).cast("long")
            ).alias("bad_variants"),
            F.sum(
                (
                    F.col("n_kept_lines") + F.col("n_removed_lines")
                    != F.col("n_lines")
                ).cast("long")
            ).alias("bad_ledger"),
            F.count("*").alias("n"),
        ).first()
        return res, agg

    res, agg = _timed(_build_and_agg)
    try:
        assert agg["n"] == COPIES * 5000 + 500
        assert agg["bad_copies"] == 0
        assert agg["bad_variants"] == 0
        assert agg["bad_ledger"] == 0
        empty_md5 = hashlib.md5(b"").hexdigest()
        wrong_digest = res.where(
            (F.col("n_kept_lines") == 0) & (F.col("kept_md5") != empty_md5)
        ).count()
        assert wrong_digest == 0
    finally:
        res.unpersist()


def test_split_decontaminate_attributes_planted_cross_split_dups(
    spark, big_dir
):
    """split_decontaminate on the salted corpus: splits are a salted
    hash of doc_id, so the 10 copies of a base doc straddle
    train/val/test BY CONSTRUCTION — planted cross-split exact dups.
    Every train member of a family with at least one val/test member
    must be attributed in the drop-from-train list, with per-split dup
    counts at least the family's eval membership (planted near-dup
    neighbors can only add) and max_jaccard exactly 1.0 (the exact-copy
    pair dominates). The LSH pair volume is sum(n_c^2)-bounded, so 10x
    duplication stays inside the wall budget."""
    from mapreduce_framework_in_go_spark.operators.sampling import split_col
    from mapreduce_framework_in_go_spark.registry import all_queries

    def _build():
        return all_queries()["split_decontaminate"].fn(spark, big_dir).persist()

    out = _timed(_build)
    try:
        fam = (
            spark.read.parquet(f"{big_dir}/documents.parquet")
            .where(F.col("doc_id") < VARIANT_BASE)
            .select(
                "doc_id",
                (F.col("doc_id") % COPY_STRIDE).alias("base"),
                split_col(F.col("doc_id")).alias("s"),
            )
        )
        famstats = fam.groupBy("base").agg(
            F.sum((F.col("s") == "val").cast("long")).alias("fam_val"),
            F.sum((F.col("s") == "test").cast("long")).alias("fam_test"),
        )
        expected = (
            fam.where(F.col("s") == "train")
            .join(
                famstats.where(F.col("fam_val") + F.col("fam_test") > 0),
                "base",
            )
            .select("doc_id", "fam_val", "fam_test")
        )
        n_expected = expected.count()
        assert n_expected > 0, "salted splits produced no cross-split family"
        joined = expected.join(out, "doc_id", "left")
        agg = joined.agg(
            F.sum(F.col("n_eval_dups").isNull().cast("long")).alias(
                "unattributed"
            ),
            F.sum(
                (F.col("n_val_dups") < F.col("fam_val")).cast("long")
            ).alias("under_val"),
            F.sum(
                (F.col("n_test_dups") < F.col("fam_test")).cast("long")
            ).alias("under_test"),
            F.sum((F.col("max_jaccard") != 1.0).cast("long")).alias(
                "not_exact"
            ),
        ).first()
        assert agg["unattributed"] == 0
        assert agg["under_val"] == 0
        assert agg["under_test"] == 0
        assert agg["not_exact"] == 0
    finally:
        out.unpersist()


# --- round-9 family: the map-only Gopher repetition filter -----------


def test_gopher_repetition_copy_families_share_flags(spark, big_dir):
    """gopher_repetition_flags on the 55,500-doc salted corpus: every
    statistic is a function of ONE document, so the 10 exact copies of
    each base doc must report the IDENTICAL full flag vector, and the
    whole pass stays linear (map-only over input splits — the salted
    corpus is ~11x the scan, nothing superlinear, no key shuffle)."""
    from mapreduce_framework_in_go_spark.operators.textops import (
        gopher_repetition_flags,
    )

    def _build_and_agg():
        out = gopher_repetition_flags(spark, big_dir)
        flag_cols = [c for c in out.columns if c != "doc_id"]
        fams = (
            out.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("base"))
            .agg(
                F.count("*").alias("n"),
                F.countDistinct(F.struct(*flag_cols)).alias("n_variants"),
            )
        )
        return fams.agg(
            F.count("*").alias("n_fams"),
            F.sum((F.col("n") != COPIES).cast("long")).alias("bad_size"),
            F.sum((F.col("n_variants") != 1).cast("long")).alias(
                "disagreeing"
            ),
        ).first()

    agg = _timed(_build_and_agg)
    assert agg["n_fams"] > 0
    assert agg["bad_size"] == 0, "a copy family lost members"
    assert agg["disagreeing"] == 0, (
        "exact copies disagreed on repetition flags — per-doc determinism "
        "broke under the salted corpus"
    )


def test_merge_only_cost_tracks_delta_not_corpus(spark, big_dir):
    """The deployment-shape gate (r10 verdict ask #3): against the
    STORED index, a weekly increment's cost must track the delta,
    never the standing corpus. Two assertions on the 50k skew corpus:

    - WORK: advancing the index past the 45,500-doc delta appends
      sketch/band rows for EXACTLY the 500 new-digest variant reps —
      the 45,000-copy exact-dup flood appends nothing (digest
      matches), so index growth is bounded by novel text, not volume.
    - COST: the indexed merge of the full delta runs in less time
      than building the 5,000-doc base clustering + index — a
      regression that silently re-sketches the base rep set (the
      corpus-scale work the index exists to avoid) costs at least the
      index build and trips this.
    """
    from mapreduce_framework_in_go_spark.operators import dedup

    docs = spark.read.parquet(f"{big_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.where(F.col("doc_id") < COPY_STRIDE)
    delta = docs.where(F.col("doc_id") >= COPY_STRIDE)

    t0 = time.monotonic()
    base_labels = (
        dedup._clusters_lsh_frame(base)
        .select("doc_id", "cluster_rep")
        .localCheckpoint()
    )
    index = {
        k: v.localCheckpoint()
        for k, v in dedup.build_cluster_index(base).items()
    }
    t_base = time.monotonic() - t0

    _new_index, appends = dedup.advance_cluster_index(index, delta)
    sketched = appends["sketch"].select("doc_id").distinct().count()
    assert sketched == 500, (
        f"{sketched} delta docs sketched — the exact-dup flood must "
        "append nothing (only new-digest variant reps are sketched)"
    )
    upserts = appends["groups"].count()
    n_delta_digests = (
        delta.select(F.md5("text")).distinct().count()
    )  # ~5500 minus the few exact-dup texts already in sf0.1 itself
    assert upserts == n_delta_digests, (
        "group upserts must be ONE row per distinct delta digest "
        f"(got {upserts}, expected {n_delta_digests})"
    )

    t1 = time.monotonic()
    out = dedup.clusters_delta_frame(
        base,
        delta,
        base_labels,
        base_index=index,
        gen_slot=dedup._CLUSTERS_MERGE_GENERATION,
    )
    n = out.count()
    t_merge = time.monotonic() - t1
    assert n == docs.count()  # every doc is in a >= 10-wide crowd
    assert dedup.RUN_STATS.get("delta_sketch_scope") == "delta_new_reps"
    # 12 s floor: at this toy scale fixed per-stage overhead dominates
    # and wall ratios below it are noise, not structure; 0.6x keeps the
    # bound meaningful when t_base is large (a base re-sketch inside
    # the merge costs roughly the index-build share of t_base).
    # Quiet-host guard (ADVICE r11): the session-tier bimodality
    # documented in CLAUDE.md can wobble t_merge 2-3x independent of
    # code (observed in-suite at load ~5); the STRUCTURAL invariants
    # above (delta_sketch_scope + append row counts) always assert,
    # but the wall ratio only gates on a genuinely quiet host — the
    # bench-tier minima row for dedup_clusters_delta_merge_only
    # catches real merge-cost regressions every round regardless.
    load = float(open("/proc/loadavg").read().split()[0])
    if load <= 4.0:
        assert t_merge < max(0.6 * t_base, 12.0), (
            f"indexed merge took {t_merge:.1f}s vs {t_base:.1f}s base "
            "build — merge-only cost is no longer delta-bounded"
        )


def test_clusters_delta_merge_at_scale(spark, big_dir):
    """The incremental merge under 10x skew: base = the 5,000 originals
    (frozen clustering), delta = 45,000 exact copies + 500 near-dup
    variants. The attach path must absorb the exact-dup flood with ZERO
    delta sketching for those docs (they are digest matches — only the
    500 new-digest variant reps ever reach the band join), families must
    never split, and variants must merge into their base's cluster
    through the bands."""
    from mapreduce_framework_in_go_spark.operators import dedup

    docs = spark.read.parquet(f"{big_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.where(F.col("doc_id") < COPY_STRIDE)
    delta = docs.where(F.col("doc_id") >= COPY_STRIDE)

    def _build():
        base_labels = dedup._clusters_lsh_frame(base).select(
            "doc_id", "cluster_rep"
        )
        out = dedup.clusters_delta_frame(base, delta, base_labels).persist()
        agg = out.agg(
            F.count("*").alias("n_members"),
            F.sum(
                F.col("doc_id")
                .between(COPY_STRIDE, VARIANT_BASE - 1)
                .cast("long")
            ).alias("n_copies"),
        ).first()
        return out, agg

    out, agg = _timed(_build)
    try:
        # every exact copy merged via the digest-attach path
        assert agg["n_copies"] == (COPIES - 1) * 5000
        # copy families co-clustered with their original, never split
        fam = (
            out.where(F.col("doc_id") < VARIANT_BASE)
            .groupBy((F.col("doc_id") % COPY_STRIDE).alias("b"))
            .agg(
                F.count_distinct("cluster_rep").alias("n_labels"),
                F.count("*").alias("n"),
            )
        )
        bad = fam.where(
            (F.col("n_labels") > 1) | (F.col("n") < COPIES)
        ).count()
        assert bad == 0
        # new-digest variants reach their base's cluster through bands
        base_label = out.where(F.col("doc_id") < COPY_STRIDE).select(
            F.col("doc_id").alias("b"), F.col("cluster_rep").alias("base_rep")
        )
        n_joined = (
            out.where(F.col("doc_id") >= VARIANT_BASE)
            .select((F.col("doc_id") - VARIANT_BASE).alias("b"), "cluster_rep")
            .join(base_label, "b")
            .where(F.col("cluster_rep") == F.col("base_rep"))
            .count()
        )
        assert n_joined >= 0.95 * 500
    finally:
        out.unpersist()
