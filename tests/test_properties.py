"""Hypothesis property checks for the pure arithmetic contracts the
new sketch/sampling operators rely on — exercised over random inputs
in plain Python (the Spark twins are pinned by fixture tests; these
prove the INVARIANTS hold on any input, not just our corpora)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_framework_in_go_spark.operators import frequency


@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=300),
    k=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_weighted_systematic_pick_counts(weights, k):
    """The integer selection rule floor(cum*K/total) > floor(prev*K/total)
    picks at most K rows, exactly K when no row spans multiple strata
    (w <= total/K), and total boundary crossings always equal K."""
    total = sum(weights)
    cum = 0
    picks = 0
    crossings = 0
    multi = 0
    for w in weights:
        prev = cum
        cum += w
        jump = (cum * k) // total - (prev * k) // total
        if jump > 0:
            picks += 1
            crossings += jump
            if jump > 1:
                multi += 1
    assert crossings == k  # every stratum boundary crossed exactly once
    assert picks <= k
    assert picks >= k - sum(
        (w * k) // total for w in weights if w * k > total
    )  # heavy rows are the only source of pick loss
    if all(w * k <= total for w in weights):
        assert picks == k
    assert multi == 0 or any(w * k > total for w in weights)


@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=40),  # key ids: small domain
        min_size=1,
        max_size=2000,
    ),
    cap=st.integers(min_value=2, max_value=12),
    batch=st.integers(min_value=1, max_value=257),
)
@settings(max_examples=100, deadline=None)
def test_misra_gries_guarantee_any_stream(stream, cap, batch):
    """Misra-Gries over arbitrary streams/batch boundaries: final
    summary holds <= cap keys and contains EVERY key with true
    frequency > n/(cap+1) — the recall guarantee the two-phase heavy
    hitters plan is built on."""
    import pandas as pd

    keys = [f"k{v}" for v in stream]
    batches = [
        pd.DataFrame({"s": keys[i : i + batch]})
        for i in range(0, len(keys), batch)
    ]
    (out,) = list(frequency._make_mg_candidates(cap)(iter(batches)))
    survivors = set(out["s"])
    assert len(survivors) <= cap
    n = len(keys)
    from collections import Counter

    for key, freq in Counter(keys).items():
        if freq > n / (cap + 1):
            assert key in survivors, (key, freq, n, cap)
