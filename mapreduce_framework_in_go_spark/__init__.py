"""PySpark-native analytics engine with the query and data-processing
capabilities of ``liyefei737/mapreduce-framework-in-go``.

The reference is a Go MapReduce framework (master + workers over RPC, per
MIT 6.824 lab 1) plus a declared-but-skeletal linearizable sharded KV tier.
This package re-expresses the full capability surface Spark-first:

- ``operators.mapreduce``  — the MR query surface (word count, inverted
  index, crash-shape aggregate) and the generic ``mr_run`` Map/Reduce UDF
  contract, with the *sequential oracle's* global group-by-key semantics
  (reference ``main/mrsequential.go:38-86``, NOT the per-file grouping bug
  in ``mr/worker.go:94-125``).
- ``operators.relational`` — the relational operator registry (scans,
  project/filter, joins, aggregations, windows, sorts, set ops) over the
  TPC-H-ish test tables; everything declarative so Catalyst plans it.
- ``operators.kv``         — the declared KV tier (get/put/append ordered
  fold with op-id dedup, key2shard, config rebalance) as batch dataflow.
- ``streaming``            — Structured Streaming variants (windowed aggs
  with watermarks, stateful KV fold).
- ``operators.dedup`` / ``operators.similarity`` / ``operators.textops``
  / ``operators.multimodal`` — the large-scale training-data-pipeline
  extensions (exact/MinHash-LSH/SimHash/Jaccard dedup, ANN search,
  language-ID/quality/token stats, binary-column plumbing).

Every query is registered in ``registry.REGISTRY`` together with an ANSI
SQL oracle (run by DuckDB over the same parquet) so correctness is
mechanically checkable.
"""

__version__ = "0.1.0"
