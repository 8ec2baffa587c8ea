"""Semantics of the ExactSubstr-style duplicated-span detector on
crafted corpora with known shared regions (oracle parity at corpus
scale is covered by test_registry_all)."""

import pyspark.sql.functions as F

from mapreduce_framework_in_go_spark.operators.spans import (
    SPAN_W,
    dup_spans_from,
)


def _docs(spark, texts: dict[int, list[str]]):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in texts.items()],
        "doc_id long, text string",
    )


def _spans(spark, texts):
    rows = dup_spans_from(_docs(spark, texts)).collect()
    return {
        (r.doc_id, r.span_start, r.span_end): (r.span_tokens, r.n_dup_grams)
        for r in rows
    }


def test_shared_middle_region_merges_to_one_maximal_span(spark):
    assert SPAN_W == 5  # boundary arithmetic below assumes W=5
    shared = [f"s{i}" for i in range(10)]  # 10 shared tokens
    texts = {
        1: [f"a{i}" for i in range(5)] + shared + [f"z{i}" for i in range(5)],
        2: [f"b{i}" for i in range(3)] + shared + [f"y{i}" for i in range(7)],
    }
    out = _spans(spark, texts)
    # doc 1: shared tokens occupy positions 6..15; windows 6..11 (6 grams)
    # merge into ONE island covering exactly the shared region.
    assert out == {
        (1, 6, 15): (10, 6),
        (2, 4, 13): (10, 6),
    }


def test_two_disjoint_shared_regions_stay_two_spans(spark):
    s1 = [f"p{i}" for i in range(SPAN_W)]  # exactly one window each
    s2 = [f"q{i}" for i in range(SPAN_W)]
    texts = {
        1: [f"a{i}" for i in range(3)] + s1 + [f"m{i}" for i in range(4)] + s2,
        2: s2 + [f"n{i}" for i in range(6)] + s1,
    }
    out = _spans(spark, texts)
    assert out == {
        (1, 4, 8): (5, 1),
        (1, 13, 17): (5, 1),
        (2, 1, 5): (5, 1),
        (2, 12, 16): (5, 1),
    }


def test_within_document_repetition_is_not_cross_document(spark):
    """A region repeated INSIDE one doc but absent elsewhere must not
    flag (the criterion is min(doc_id) <> max(doc_id) per gram)."""
    rep = [f"r{i}" for i in range(SPAN_W)]
    texts = {
        1: rep + ["gap"] + rep,
        2: [f"u{i}" for i in range(12)],
    }
    assert _spans(spark, texts) == {}


def test_identical_documents_flag_everything(spark):
    toks = [f"w{i}" for i in range(8)]
    texts = {1: toks, 2: list(toks)}
    n = len(toks)
    expect = (n, n - SPAN_W + 1)
    assert _spans(spark, texts) == {
        (1, 1, n): expect,
        (2, 1, n): expect,
    }


def test_short_documents_produce_no_windows(spark):
    texts = {
        1: [f"w{i}" for i in range(SPAN_W - 1)],
        2: [f"w{i}" for i in range(SPAN_W - 1)],
    }
    assert _spans(spark, texts) == {}


def test_stats_ledger_counts_disjoint_span_union(spark, sf_dir):
    """dup_tokens must equal the union of that doc's (disjoint) spans
    and never exceed the token count."""
    from mapreduce_framework_in_go_spark.registry import all_queries

    stats = all_queries()["dedup_substring_stats"].fn(spark, sf_dir)
    bad = stats.where(
        (F.col("dup_tokens") > F.col("n_tokens"))
        | (F.col("dup_tokens") < 0)
        | ((F.col("n_spans") == 0) != (F.col("dup_tokens") == 0))
    )
    assert bad.count() == 0


def test_scrub_keeps_exactly_the_earliest_copy(spark):
    """Identical docs: the smallest doc_id survives untouched, every
    later copy scrubs to empty — one occurrence remains corpus-wide."""
    from mapreduce_framework_in_go_spark.operators.spans import (
        dup_spans_from,
    )

    toks = [f"w{i}" for i in range(8)]
    docs = _docs(spark, {3: toks, 7: list(toks), 9: list(toks)})
    spans = dup_spans_from(docs, keep_earliest=True).collect()
    flagged = {r.doc_id for r in spans}
    assert flagged == {7, 9}  # doc 3 (the min) never flags
    assert all(
        (r.span_start, r.span_end) == (1, len(toks)) for r in spans
    )


def test_scrub_cuts_only_the_shared_region_of_the_later_doc(spark):
    from mapreduce_framework_in_go_spark.operators.spans import (
        dup_spans_from,
    )

    shared = [f"s{i}" for i in range(10)]
    texts = {
        1: [f"a{i}" for i in range(5)] + shared,
        2: shared + [f"b{i}" for i in range(5)],
    }
    spans = dup_spans_from(_docs(spark, texts), keep_earliest=True).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [
        (2, 1, 10)
    ]


def test_spans_match_independent_python_model(spark):
    """Property check against a brute-force model (the oracle SQL
    mirrors the dataflow, so an INDEPENDENT implementation is the real
    cross-check): tiny vocab forces cross-doc gram collisions."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus_strategy = st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
        min_size=2,
        max_size=5,
    )

    def model(texts):
        grams = {}
        for d, toks in texts.items():
            for p in range(len(toks) - SPAN_W + 1):
                grams.setdefault(tuple(toks[p:p + SPAN_W]), set()).add(d)
        out = {}
        for d, toks in texts.items():
            flagged = [
                p + 1
                for p in range(len(toks) - SPAN_W + 1)
                if len(grams[tuple(toks[p:p + SPAN_W])]) > 1
            ]
            spans = []
            for p in flagged:
                # merge while coverage stays contiguous (gap <= W)
                if spans and p - spans[-1][1] <= SPAN_W:
                    spans[-1][1] = p
                    spans[-1][2] += 1
                else:
                    spans.append([p, p, 1])
            for s, e, n in spans:
                out[(d, s, e + SPAN_W - 1)] = (e + SPAN_W - 1 - s + 1, n)
        return out

    @given(corpus_strategy)
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(docs):
        texts = dict(enumerate(docs))
        assert _spans(spark, texts) == model(texts)

    check()


def test_winnowing_guarantee_on_shared_run(spark):
    """The MOSS guarantee: two docs sharing a token run long enough to
    span a full window of 3-gram hashes (w + 2 + 2 tokens) must share
    at least one selected fingerprint HASH; and selection density stays
    well below 1 (the point of winnowing vs keep-everything)."""
    from mapreduce_framework_in_go_spark.operators.textops import (
        WINNOW_W,
        text_winnowing,
    )

    run_len = WINNOW_W + 2 + 2  # w windows of 3-gram hashes
    shared = [f"s{i}" for i in range(run_len)]
    a = [f"a{i}" for i in range(6)] + shared + [f"z{i}" for i in range(6)]
    b = shared + [f"y{i}" for i in range(9)]
    docs = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("winnow_fixture")

    import mapreduce_framework_in_go_spark.operators.textops as tx
    from mapreduce_framework_in_go_spark.sources import tables

    orig = tables.table
    try:
        tables_patch = lambda spark_, sf, name: docs  # noqa: E731
        tx.table = tables_patch
        rows = text_winnowing(spark, "ignored").collect()
    finally:
        tx.table = orig
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[1] & fps[2], "shared run must share a fingerprint"
    n_grams_a = len(a) - 2
    assert len(fps[1]) < n_grams_a / 2  # density: strictly sampling


def test_overlapping_windows_merge_into_one_disjoint_span(spark):
    """Flagged positions 2..W-1 apart have OVERLAPPING token windows:
    they must merge into one span (review finding: consecutive-only
    islanding emitted overlapping spans whose sum double-counted the
    union, letting dup_frac exceed 1)."""
    # letter-only tokens: the letter-run tokenizer strips digits
    base = [f"t{c}" for c in "abcdefghi"]  # 9 distinct tokens
    junk1 = [f"j{c}" for c in "abcdef"]
    junk2 = [f"k{c}" for c in "abcdef"]
    texts = {
        1: base,
        # B carries t1..t5, t3..t7, t5..t9 separated by junk: A's
        # flagged positions are 1, 3, 5 (gaps of 2 < W)
        2: base[0:5] + junk1 + base[2:7] + junk2 + base[4:9],
    }
    out = _spans(spark, texts)
    doc1 = {k: v for k, v in out.items() if k[0] == 1}
    assert doc1 == {(1, 1, 9): (9, 3)}  # ONE span, union 9 tokens, 3 grams


def test_training_shuffle_is_balanced_permutation(spark, sf_dir):
    """shuffle_pos must be a dense 1..N permutation and round-robin
    sharding must balance shards to within one row."""
    from mapreduce_framework_in_go_spark.operators.training_prep import (
        SHUFFLE_SHARDS,
    )
    from mapreduce_framework_in_go_spark.registry import all_queries

    rows = all_queries()["training_shuffle_order"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n  # one position per doc
    per_shard = {}
    for r in rows:
        assert r.shard == (r.shuffle_pos - 1) % SHUFFLE_SHARDS
        per_shard[r.shard] = per_shard.get(r.shard, 0) + 1
    assert max(per_shard.values()) - min(per_shard.values()) <= 1
    # and it is not the identity order (the hash actually permutes)
    assert any(r.shuffle_pos != r.doc_id + 1 for r in rows)


def test_span_lcs_finds_longest_shared_run(spark):
    """The diagonal-island LCS must report the longest contiguous
    shared token run per pair, not the total shared volume."""
    from mapreduce_framework_in_go_spark.operators.spans import (
        dedup_span_lcs,
    )
    from mapreduce_framework_in_go_spark.operators import spans as sp
    from mapreduce_framework_in_go_spark.sources import tables

    long_run = [f"l{c}" for c in "abcdefgh"]   # 8 tokens -> 4 grams
    short_run = [f"s{c}" for c in "abcde"]     # 5 tokens -> 1 gram
    texts = {
        1: long_run + [f"x{c}" for c in "abcdef"] + short_run,
        2: short_run + [f"y{c}" for c in "abcdef"] + long_run,
    }
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()],
        "doc_id long, text string",
    )
    orig = tables.table
    try:
        sp.table = lambda s_, sf, name: docs
        rows = dedup_span_lcs(spark, "ignored").collect()
    finally:
        sp.table = orig
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # shared grams: 4 from the long run + 1 from the short run
    assert r.n_shared_grams == 5
    # the LONGEST block is the 8-token run, not 8+5 total
    assert r.lcs_tokens == len(long_run)


def test_decon_span_scrub_agrees_with_doc_verdict(spark):
    """The surgical scrub and the whole-doc verdict must agree on WHICH
    documents are contaminated: removed_tokens > 0 exactly for the docs
    decontaminate_ngram reports (any shared eval gram flags >= one
    position, and every flagged position removes >= W tokens), and
    clean docs keep their full token stream (digest of the untouched
    tokenization)."""
    from mapreduce_framework_in_go_spark.registry import all_queries

    SPECS = all_queries()
    sf = "/root/testdata/sf0.01"
    scrub = {
        r.doc_id: r
        for r in SPECS["decontaminate_span_scrub"].fn(spark, sf).collect()
    }
    flagged = {
        r.doc_id for r in SPECS["decontaminate_ngram"].fn(spark, sf).collect()
    }
    assert flagged  # the fixture plants at least one contaminated doc
    assert flagged <= set(scrub)
    for doc_id, r in scrub.items():
        if doc_id in flagged:
            assert r.removed_tokens >= SPAN_W, doc_id
        else:
            assert r.removed_tokens == 0, doc_id
        assert r.kept_tokens + r.removed_tokens == r.n_tokens, doc_id
