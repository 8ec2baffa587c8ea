"""BPE merge-learning semantics on crafted corpora: left-to-right
non-overlapping application, frequency argmax with lexicographic
tie-break, and the degenerate pairs-exhausted behavior (oracle parity
at corpus scale is covered by test_registry_all)."""

from mapreduce_framework_in_go_spark.operators.bpe import (
    BPE_MERGES,
    merge_chain_from,
)


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _merges(spark, texts):
    return merge_chain_from(_docs(spark, texts))


def test_nonoverlapping_left_to_right_application(spark):
    """'a a a' with merge (a,a) must become [aa, a], not [aa, aa]:
    pair counts after the first merge prove the application rule."""
    merges, _w = _merges(spark, ["aaa aaa"])
    # rank 1: (a,a) appears twice per word occurrence, word freq 2
    assert merges[0] == ("a", "a", 4)
    # after merging left-to-right each 'aaa' is [aa, a]: the only
    # remaining pair is (aa, a) — NOT (a, aa), which a rightmost or
    # overlapping application would produce.
    assert merges[1] == ("aa", "a", 2)
    # 'aaa' is now one symbol; pairs are exhausted
    assert merges[2] is None


def test_frequency_argmax_with_lexicographic_tie_break(spark):
    """Equal-frequency pairs must resolve by (l, r) ascending."""
    merges, _w = _merges(spark, ["cd ab", "ab cd"])
    assert merges[0] == ("a", "b", 2)  # ties (a,b) vs (c,d): lex order
    assert merges[1] == ("c", "d", 2)


def test_merged_symbol_participates_in_later_pairs(spark):
    """After (l,r) merges, the new symbol must form pairs with its
    neighbors — the core of BPE's longest-unit growth."""
    merges, w = _merges(spark, ["abab abab abc"])
    assert merges[0] == ("a", "b", 5)  # 2+2+1 occurrences, freq-weighted
    assert merges[1] == ("ab", "ab", 2)
    assert merges[2] == ("ab", "c", 1)
    # rank 4 exhausts the pairs: every word is one symbol, and the
    # documented degenerate rule empties the symbol table from there on
    assert merges[3] is None
    assert w.count() == 0


def test_vocab_usage_rides_final_symbol_table(spark, sf_dir):
    from mapreduce_framework_in_go_spark.registry import all_queries

    q = all_queries()
    usage = q["bpe_vocab_usage"].fn(spark, sf_dir)
    rows = usage.collect()
    # every learned merged symbol that survives in some word appears
    merges = {
        r.merged for r in q["bpe_learn_merges"].fn(spark, sf_dir).collect()
    }
    assert len(merges) == BPE_MERGES
    syms = {r.symbol for r in rows}
    # multi-char symbols in the usage table are exactly learned merges
    assert {s for s in syms if len(s) > 1} <= merges
    assert all(r.n_occurrences > 0 and r.n_words > 0 for r in rows)


def test_merges_match_independent_python_model(spark):
    """Property check against a textbook BPE trainer (independent of
    both the dataflow and its mirrored SQL oracle)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus_strategy = st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )

    def model(docs):
        words = Counter(w for toks in docs for w in toks)
        vocab = {w: list(w) for w in words}
        merges = []
        for _ in range(BPE_MERGES):
            pc = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += words[w]
            if not pc:
                merges.append(None)
                vocab = {}  # the documented degenerate rule
                continue
            (left, right), freq = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((left, right, freq))
            nv = {}
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):  # left-to-right, non-overlapping
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[w] = out
            vocab = nv
        return merges

    @given(corpus_strategy)
    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(docs):
        got, _w = _merges(spark, [" ".join(toks) for toks in docs])
        assert got == model(docs)

    check()
