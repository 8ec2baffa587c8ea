"""Bench regression gate (VERDICT r4 ask #6).

The plan lint (`test_plan_lint.py`) catches *shape* regressions; this
gate catches *timing* regressions mechanically: every headline query's
latest sf0.1 bench timing must stay within 2x its recorded minimum in
`tests/bench_budget.json`. Intentional plan changes (or a new headline
query) update the table in the same commit.

The gate reads the newest `BENCH_LOCAL.json` artifact written by
`bench.py` rather than re-running the bench inside pytest (the full
suite is ~100 s at sf0.1 and the driver runs it per-round anyway). If
the artifact is missing or was produced at a different SF, the timing
check skips — the coverage checks below still run unconditionally so
the table can never silently drift from `bench.HEADLINE`.
"""

from __future__ import annotations

import json
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_PATH = os.path.join(REPO_ROOT, "tests", "bench_budget.json")
LOCAL_PATH = os.path.join(REPO_ROOT, "BENCH_LOCAL.json")

# Per-query slack, TWO-TIER (VERDICT r7 ask #4): this box carries
# EXTERNAL load (r6: load avg ~5 with zero local processes), and a
# loaded window inflates untouched queries up to ~3.7x their
# quiet-window minima — so the cap is 4.0x by default (catastrophic
# regressions only). The QUIET tier (tight caps) is granted by the
# run's CALIBRATION SERIES vs the committed clean reference (r13,
# VERDICT r12 ask #2): r12 proved loadavg certifies nothing in either
# direction (a load-7.9 run measured uniform 1.12x while a load-0.2
# run sampled a slow JIT tier at 1.6x with identical code). loadavg
# remains only as the fallback for artifacts predating calib_series.
SLACK = 4.0
QUIET_SLACK = 2.5
QUIET_LOAD_MAX = 2.0  # fallback only: pre-r13 artifacts without calib
# quiet tier iff EVERY calibration probe <= this x the committed clean
# calib_sec (a healthy session probes ~1.0-1.2x; the r11 slow-JIT tier
# inflated queries 1.4-1.6x and would read well above this)
CALIB_QUIET_MAX = 1.5
# above this on EVERY probe the environment is too degraded to grade
# at all (the registry gate's CALIB_SLACK)
CALIB_DEGRADED = 2.0
TOTAL_SLACK = 1.8  # sum(latest) vs sum(minima): the sensitive gate
# Sub-second queries are dominated by fixed per-action overhead (job
# scheduling, shuffle-file setup), where slack ratios are noise.
ABS_FLOOR_SEC = 1.0


def _budget() -> dict:
    with open(BUDGET_PATH) as f:
        return json.load(f)


def test_budget_table_covers_headline_set() -> None:
    """Every bench.HEADLINE query has a budget row, and vice versa."""
    import bench

    minima = _budget()["minima"]
    headline = set(bench.HEADLINE)
    assert set(minima) == headline, (
        "bench_budget.json out of sync with bench.HEADLINE: "
        f"missing={sorted(headline - set(minima))} "
        f"stale={sorted(set(minima) - headline)} "
        "— update tests/bench_budget.json in the same commit that "
        "changes the headline set."
    )


def test_slack_overrides_cite_mechanism() -> None:
    """Every slack override names a headline query AND has a measured
    mechanism documented in SCALE.md's 'Bench slack mechanisms' section
    (VERDICT r9 ask #5: an override without a mechanism is the
    regression gate looking away from the suite's slowest queries)."""
    budget = _budget()
    overrides = budget.get("slack_overrides", {})
    with open(os.path.join(REPO_ROOT, "SCALE.md")) as f:
        scale = f.read()
    marker = "## Bench slack mechanisms"
    assert marker in scale, "SCALE.md lost its slack-mechanism section"
    section = scale.split(marker, 1)[1]
    undocumented = [
        name for name in overrides if f"`{name}`" not in section
    ]
    assert not undocumented, (
        "slack_overrides entries without a SCALE.md mechanism: "
        f"{undocumented} — measure the wobble (scripts/probe_lsh.py "
        "pattern), write the mechanism under 'Bench slack mechanisms', "
        "or delete the override."
    )
    stale = [n for n in overrides if n not in budget["minima"]]
    assert not stale, f"slack_overrides for non-headline queries: {stale}"


def test_budget_minima_are_positive_numbers() -> None:
    budget = _budget()
    assert budget["sf"] == 0.1
    for name, sec in budget["minima"].items():
        assert isinstance(sec, (int, float)) and sec > 0, name


def test_latest_bench_run_within_budget() -> None:
    if not os.path.exists(LOCAL_PATH):
        pytest.skip("no BENCH_LOCAL.json artifact (bench not run here)")
    with open(LOCAL_PATH) as f:
        latest = json.load(f)
    budget = _budget()
    if latest.get("sf") != budget["sf"]:
        pytest.skip(
            f"latest bench ran at sf{latest.get('sf')}, budgets are sf{budget['sf']}"
        )
    minima = budget["minima"]
    # Two-tier cap: a calibration-certified run can't blame the
    # environment for a >2.5x single-query miss. slack_overrides are
    # QUIET-tier widenings for known-wobbly heavy queries
    # (session-bimodal JIT profiles make even min-of-2 range 2-3x run
    # to run); the max() below means an override below the active base
    # slack never tightens it, so only overrides above QUIET_SLACK are
    # meaningful and the table stores only those.
    load = latest.get("load_avg_start")
    series = latest.get("calib_series") or []
    calib_ref = budget.get("calib_sec")
    calib_cpus_ok = latest.get("cpus") == budget.get("calib_cpus")
    if series and calib_ref and calib_cpus_ok:
        probes = [c["sec"] for c in series]
        if all(p > CALIB_DEGRADED * calib_ref for p in probes):
            pytest.skip(
                "environment degraded for the whole bench run: every "
                f"calibration probe exceeded {CALIB_DEGRADED}x the "
                f"{calib_ref}s clean reference ({probes}) — rerun on a "
                "healthy session before grading timings."
            )
        quiet = max(probes) <= CALIB_QUIET_MAX * calib_ref
    else:
        # pre-r13 artifact (or non-standard cpu count): loadavg fallback
        quiet = load is not None and load < QUIET_LOAD_MAX
    # Session-health downgrade (r11): loadavg alone misclassifies
    # slow-JIT sessions as quiet — r11 measured two quiet-start runs
    # (load 0.28 / 0.33) 50 minutes apart at 182.7 s vs 131.8 s total
    # with IDENTICAL code and memoized plans; the slow one inflated
    # most queries ~1.4-1.6x (whole-stage-codegen landed in a lower
    # compilation tier session-wide). The downgrade requires BOTH the
    # median AND the fast quartile to be inflated: an environment tier
    # shift lifts essentially every query (q25 included), while a
    # code regression in even a widely-shared helper inflates only its
    # consumers — the TPC-H/KV/events half of the suite doesn't ride
    # the text-expression helpers, so q25 stays near 1 and the quiet
    # tier keeps its teeth. Deliberate trade: a regression broad
    # enough to lift q25 past 1.15 slips to the 4x tier here, but the
    # sf0.01 registry gate (222 queries, no session downgrade) and the
    # round-over-round minima comparison still catch it.
    ratios = sorted(
        latest["queries"][n] / minima[n]
        for n in latest["queries"]
        if n in minima and minima[n] > 0
    )
    median_ratio = ratios[len(ratios) // 2] if ratios else 1.0
    q25_ratio = ratios[len(ratios) // 4] if ratios else 1.0
    q75_ratio = ratios[(3 * len(ratios)) // 4] if ratios else 1.0
    if median_ratio > 1.35 and q25_ratio > 1.15:
        # Corroboration (ADVICE r11): a session-tier shift inflates
        # essentially EVERY query by a similar factor (r11 measured
        # ~1.4-1.6x across the board) — so before the downgrade may
        # widen its own gate, the inflation must LOOK like an
        # environment tier: bounded magnitude and uniform spread. A
        # broad code regression concentrated in shared helpers lifts
        # its consumers far more than the rest (spread), and nothing
        # environmental on this box has ever produced a >2.2x median
        # (magnitude). Failing loudly here beats silently grading a
        # real regression on 4x slack.
        tier_like = median_ratio <= 2.2 and q75_ratio <= 1.8 * q25_ratio
        assert tier_like, (
            f"broad inflation (median {median_ratio:.2f}x, "
            f"q25 {q25_ratio:.2f}x, q75 {q75_ratio:.2f}x) does NOT "
            "match a session-JIT tier profile (uniform, <=2.2x median) "
            "— likely a real broad regression; rerun the bench on a "
            "warm quiet session before trusting or refreshing minima."
        )
        quiet = False
    base_slack = QUIET_SLACK if quiet else SLACK
    overrides = budget.get("slack_overrides", {})
    over = {}
    for name, sec in latest["queries"].items():
        if name not in minima:
            continue  # new query: covered by the sync test after table update
        slack = max(overrides.get(name, base_slack), base_slack)
        cap = max(slack * minima[name], ABS_FLOOR_SEC)
        if sec > cap:
            over[name] = (sec, round(cap, 3))
    assert not over, (
        f"headline queries regressed past {base_slack}x "
        f"(quiet={quiet}, load_avg_start={load}) their recorded sf0.1 "
        f"minima (query: (latest_sec, cap_sec)): {over} — if the plan "
        "change is intentional, refresh tests/bench_budget.json in the "
        "same commit."
    )
    shared = [n for n in latest["queries"] if n in minima]
    total_latest = sum(latest["queries"][n] for n in shared)
    total_min = sum(minima[n] for n in shared)
    assert total_latest <= TOTAL_SLACK * total_min, (
        f"headline total regressed: {total_latest:.1f}s vs "
        f"{total_min:.1f}s recorded minima (cap {TOTAL_SLACK}x) — "
        "either a broad plan regression or rerun on a quiet host."
    )
