"""Central query registry.

Every implemented operator registers one (or more) named queries here.
A query is ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible,
an ANSI SQL *oracle* string that DuckDB runs over the same parquet tables
(views ``region nation customer supplier part orders lineitem events
documents embeddings``). The driver hash-compares engine vs oracle; that
is the correctness gate, so:

- every computed column is aliased identically on both sides;
- float aggregates are ``round(x, 2)`` (or more digits where noted) on
  both sides so summation order can't flip the hash;
- integer sums are CAST to BIGINT in the oracle (DuckDB widens to
  HUGEINT, Spark stays BIGINT);
- timestamps/dates in output are cast to strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: list[str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        import functools

        @functools.wraps(fn)
        def dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Package-referencing UDFs (applyInPandas*, foreachBatch)
            # unpickle by module import on executor workers; ship the
            # package once per application so queries work when the
            # driver loaded us from an arbitrary cwd (see pyship.py).
            from .pyship import ensure_package_shipped

            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=dispatch,
            oracle=oracle,
            doc=doc or fn.__doc__ or "",
            tags=tags or [],
        )
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so its @register calls run."""
    from .operators import (  # noqa: F401
        bloom,
        bpe,
        c4,
        classifier,
        compaction,
        dedup,
        dsir,
        entity,
        frequency,
        graph,
        ivfpq,
        ivm,
        jpeg,
        kv,
        langmodel,
        linearizability,
        mapreduce,
        multimodal,
        pipeline,
        pq,
        privacy,
        quality,
        relational,
        sampling,
        semdedup,
        similarity,
        sketches,
        skew,
        spans,
        stats,
        streaming_queries,
        temporal,
        textops,
        timeseries,
        tpch_extra,
        tpch_partsupp,
        training_prep,
        udx,
        warc,
        zorder,
    )


def all_queries() -> dict[str, QuerySpec]:
    load_all_operators()
    return dict(REGISTRY)
