"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4.1) — Catalyst is ours for
free, but only if the plan actually shows the wins. These helpers let
tests assert the plan shape (filters pushed to the parquet scan, small
dims broadcast, codegen spans) instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan node advertises pushed filters mentioning each fragment."""
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, f"no PushedFilters in plan:\n{plan}"
    for frag in fragments:
        assert frag in plan, f"filter fragment {frag!r} not pushed:\n{plan}"


def assert_broadcast_join(df: DataFrame, n: int = 1) -> None:
    plan = formatted_plan(df)
    found = plan.count("BroadcastHashJoin")
    assert found >= n, f"expected >= {n} BroadcastHashJoin, found {found}:\n{plan}"
