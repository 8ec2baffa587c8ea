"""Bloom-filter join pruning — the runtime-filter pattern for joins
whose build side is too large to broadcast as a hash relation.

The 100 TB problem: ``fact JOIN dim_filtered`` where the filtered build
side is millions of keys — too big for a broadcast hash join — forces a
shuffle of the ENTIRE fact table even though only a fraction of its
rows survive the join. The classic fix (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects it when
statistics allow; this module makes the technique an explicit,
testable operator) is a semi-join reduction: aggregate the build keys
into a Bloom filter of a few KB, broadcast THAT, and drop fact rows
map-side before the exchange. Bloom filters have no false negatives,
so the subsequent exact join makes the result identical to the plain
join — which is exactly what makes this oracle-checkable: the oracle
is the plain SQL join, and the bloom stage must be lossless or the
hash check fails.

Built with DataFrame aggregations, NOT ``df.stat.bloomFilter`` (which
collects the filter to the driver as a Python object — a driver-side
action this codebase bans from hot paths):

- build: k=3 positions per key via ``xxhash64(key, seed)``; positions
  fold into 64-bit words by ``bit_or`` (one shuffle of <= 3n position
  rows down to <= M/64 = 2048 words), then one row: a DENSE
  ``array<long>`` of all M/64 words (absent word = 0).
- probe: broadcast the 1-row array; a fact row survives iff all k bits
  are set. Pure map-side — the plan shows BroadcastNestedLoopJoin over
  one row, then Filter. The word vector must be an ARRAY, not a
  ``map<long, long>``: Spark's MapData is array-backed with O(entries)
  linear-scan lookup, so a 2048-word map costs 3 x 2048 comparisons
  per fact row (measured ~1.5 s of the query's wall at sf0.1 — the r10
  2x-floor mystery); array ``element_at`` is O(1) indexing.

Sizing: 2^17 bits / 3 hashes ~= 2.5% false positives at 15k keys (the
sf0.1 build density); at real scale pick ~10 bits per key — still KBs
per million keys where a broadcast hash relation needs tens of MBs.
The exact join's shuffle then carries only survivors + FP residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .relational import fsum

BLOOM_M = 1 << 17  # bits in the filter
BLOOM_K = 3  # hash functions
PRICE_MIN = 450_000.0  # build-side predicate: ~10% of orders


def _pos_sql(key: str, seed: int) -> str:
    return f"pmod(xxhash64({key}, {seed}), {BLOOM_M})"


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """1-row frame ``bf: array<long>`` — the Bloom filter's M/64 64-bit
    words as a dense 1-indexed array (position w at element w+1, unset
    words 0), built by pure aggregation (nothing touches the driver).
    Densifying costs one M/64-element fold in the 1-row aggregate;
    probing becomes O(1) array indexing per hash."""
    entries = keys.selectExpr(
        f"explode(array({', '.join(_pos_sql(key_col, s) for s in range(1, BLOOM_K + 1))})) AS _pos"
    )
    words = entries.selectExpr(
        "shiftright(_pos, 6) AS w",
        "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT)) AS m",
    ).groupBy("w").agg(F.bit_or("m").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bfm")
    ).selectExpr(
        f"transform(sequence(0, {BLOOM_M // 64 - 1}), "
        "w -> coalesce(try_element_at(bfm, CAST(w AS BIGINT)), "
        "CAST(0 AS BIGINT))) AS bf"
    )


def bloom_filtered(facts: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Fact rows whose key has all k Bloom bits set: broadcast the 1-row
    word array and filter map-side — this is the pre-shuffle prune.
    ``element_at`` on the dense array is O(1); positions are in range
    by construction (pmod < M), so the lookup cannot go out of bounds
    under ANSI."""
    checks = " AND ".join(
        f"(element_at(bf, CAST(shiftright({_pos_sql(key_col, s)}, 6) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod({_pos_sql(key_col, s)}, 64) AS INT))"
        f") != 0"
        for s in range(1, BLOOM_K + 1)
    )
    return facts.join(F.broadcast(bloom)).where(F.expr(checks)).drop("bf")


@register(
    "bloom_prune_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > {PRICE_MIN}
    GROUP BY o_orderpriority
    """,
    doc="Revenue of line items of high-value orders, computed through a "
    "Bloom-filter semi-join reduction: the filtered orders' keys fold "
    "into a 16 KB broadcast bit map that prunes ~90% of lineitem "
    "map-side BEFORE any exchange; the exact join afterwards cancels "
    "false positives, so the result is bit-identical to the plain join "
    "the oracle runs (lossless-or-fail is the point of the hash check). "
    "The pattern a 1000-executor cluster needs when the build side "
    "outgrows broadcast-hash range but the fact shuffle is the cost.",
    tags=["joins", "sketches"],
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > PRICE_MIN)
    li = table(spark, sf_dir, "lineitem")

    bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    pruned = bloom_filtered(
        li.select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey", bloom
    )

    return (
        pruned.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000).alias(
                "revenue"
            ),
        )
    )
