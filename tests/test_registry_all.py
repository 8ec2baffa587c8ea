"""Generic gate: every registered query with an oracle must hash-match
DuckDB at sf0.001 (the driver does the same at sf0.01). New operators get
this test for free by registering."""

import pytest

from mapreduce_framework_in_go_spark.registry import all_queries

from .oracle import compare

SPECS = all_queries()
ORACLED = sorted(name for name, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(name, spark, sf_dir, duck):
    spec = SPECS[name]
    compare(spec.fn(spark, sf_dir), duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
