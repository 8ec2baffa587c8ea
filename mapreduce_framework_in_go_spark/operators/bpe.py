"""BPE merge learning — the tokenizer-training artifact of an LLM data
pipeline, as exact relational dataflow.

Byte-pair encoding training (Sennrich et al. 2016; the procedure behind
GPT-2/RoBERTa vocabularies) is usually presented as an in-memory loop;
its data-parallel shape is the same one ``lm_kn_bigrams`` uses: the only
corpus-sized work is ONE token count (explode + two-level groupBy with
map-side combine), and every training iteration runs on the *word
table* — |vocab| rows — which is tiny even when the corpus is 100 TB.
Per iteration:

1. adjacent symbol pairs per word, weighted by word frequency — a
   vocab-sized explode;
2. the argmax pair by (total frequency DESC, pair ASC) — a 1-row frame,
   broadcast (BroadcastNestedLoopJoin, never a shuffle);
3. apply the merge to every word's symbol string.

Step 3 is where naive formulations go quadratic or nondeterministic.
BPE replaces NON-OVERLAPPING occurrences left-to-right ("a a a" with
merge (a,a) -> "aa a"); that is exactly the semantics of SQL
``replace()`` when symbols are encoded as a spaced string with the
invariant *every symbol carries its own leading and trailing space*
(``"abc"`` -> ``' a  b  c '``): the pattern ``' l  r '`` consumes both
symbols' inner spaces, the replacement ``' lr '`` restores the
invariant, and the scan resumes after the replacement — matching BPE's
left-to-right non-overlap rule. Both engines implement ``replace`` with
those semantics, so every iteration is bitwise reproducible and the
whole merge table is hash-checked against the DuckDB oracle (the
unrolled-CTE pattern ``_lloyd_ctes`` established for trained IVF).

Ties in pair frequency break by pair lexicographic order — a total
order, so the learned table is deterministic under any partitioning.

Reference parity: the reference's app surface is token-count-shaped
(``mrapps/wc.go``); this is the §7 training-data extension that turns
the same letter-run token stream into a tokenizer artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..registry import register
from ..sources.tables import table

BPE_MERGES = 6  # learned merge ranks (unrolled identically in the oracle)

# one-generation cache (dedup.py policy): the word table and each
# iteration's 1-row argmax / vocab-sized symbol table have multiple
# consumers (next iteration + the output union); without persist each
# consumer re-plans its whole subtree — the corpus count would run once
# per 2^iteration branch instead of once.
_CACHE_GENERATION: list[DataFrame] = []


def _evict_previous_generation() -> None:
    while _CACHE_GENERATION:
        try:
            _CACHE_GENERATION.pop().unpersist()
        except Exception:
            pass


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHE_GENERATION.append(df)
    return df


def _syms_col():
    return F.filter(F.split("s", " +"), lambda t: t != F.lit(""))


def _merge_chain(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    return merge_chain_from(table(spark, sf_dir, "documents"))


def merge_chain_from(docs: DataFrame) -> tuple[list[DataFrame], DataFrame]:
    """([best_1..best_N], w_N): the learned merges (1-row frames of
    l, r, pair_freq) and the final per-word symbol table.

    A corpus that runs out of distinct pairs before rank N yields EMPTY
    argmax frames from that rank on (the merge table simply has fewer
    rows) — and the cross join makes the symbol table empty too; real
    corpora never get close (rank N needs only N distinct adjacent
    pairs), and the oracle's CTE chain reproduces the same behavior.
    """
    _evict_previous_generation()
    w = _persist(
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            "word",
            "freq",
            F.regexp_replace("word", "(.)", " $1 ").alias("s"),
        )
    )
    bests: list[DataFrame] = []
    for _ in range(BPE_MERGES):
        syms = _syms_col()
        m = F.size(syms) - 1
        pairs = F.when(
            m > 0,
            F.zip_with(
                F.slice(syms, 1, F.greatest(m, F.lit(0))),
                F.slice(syms, 2, F.greatest(m, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        best = _persist(
            w.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), "l", "r")
            .limit(1)
        )
        bests.append(best)
        w = _persist(
            w.crossJoin(F.broadcast(best.select("l", "r"))).select(
                "word",
                "freq",
                F.replace(
                    F.col("s"),
                    F.concat(F.lit(" "), "l", F.lit("  "), "r", F.lit(" ")),
                    F.concat(F.lit(" "), "l", "r", F.lit(" ")),
                ).alias("s"),
            )
        )
    return bests, w


def _w0_cte() -> str:
    return r"""
  w0 AS (
    SELECT word, CAST(count(*) AS BIGINT) AS freq,
           regexp_replace(word, '(.)', ' \1 ', 'g') AS s
    FROM (
      SELECT unnest(regexp_extract_all(text, '[\p{L}]+')) AS word
      FROM documents
    )
    GROUP BY word
  )
"""


def _iter_ctes(n: int) -> str:
    parts = []
    for i in range(1, n + 1):
        parts.append(f"""
  p{i} AS (
    SELECT syms[j] AS l, syms[j + 1] AS r,
           CAST(sum(freq) AS BIGINT) AS pair_freq
    FROM (
      SELECT freq,
             list_filter(string_split_regex(s, ' +'), x -> x <> '') AS syms
      FROM w{i - 1}
    ), unnest(range(1, len(syms))) u(j)
    GROUP BY l, r
  ),
  m{i} AS (
    SELECT l, r, pair_freq FROM p{i} ORDER BY pair_freq DESC, l, r LIMIT 1
  ),
  w{i} AS (
    SELECT word, freq,
           replace(s, ' ' || m.l || '  ' || m.r || ' ',
                      ' ' || m.l || m.r || ' ') AS s
    FROM w{i - 1}, m{i} AS m
  )""")
    return ",".join(parts)


def _merges_union_sql(n: int) -> str:
    return "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, l, r, "
        f"l || r AS merged, pair_freq FROM m{i}"
        for i in range(1, n + 1)
    )


@register(
    "bpe_learn_merges",
    oracle=f"""
    WITH {_w0_cte()}, {_iter_ctes(BPE_MERGES)}
    {_merges_union_sql(BPE_MERGES)}
    """,
    doc=f"The learned BPE merge table ({BPE_MERGES} ranks): at each rank "
    "the corpus-frequency-argmax adjacent symbol pair (ties by pair "
    "order) and its frequency. Corpus cost is one token count; every "
    "iteration rides the vocab-sized word table with a 1-row broadcast "
    "argmax — the lm_kn_bigrams scale shape.",
    tags=["training_prep", "bpe"],
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    bests, _w = _merge_chain(spark, sf_dir)
    out = None
    for i, b in enumerate(bests, start=1):
        row = b.select(
            F.lit(i).cast("long").alias("merge_rank"),
            "l",
            "r",
            F.concat("l", "r").alias("merged"),
            "pair_freq",
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "bpe_vocab_usage",
    oracle=f"""
    WITH {_w0_cte()}, {_iter_ctes(BPE_MERGES)},
    u AS (
      SELECT word, freq,
             unnest(list_filter(string_split_regex(s, ' +'), x -> x <> ''))
               AS symbol
      FROM w{BPE_MERGES}
    )
    SELECT symbol,
           CAST(length(symbol) AS BIGINT) AS n_chars,
           CAST(sum(freq) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM u GROUP BY symbol
    """,
    doc="Corpus usage of the post-merge symbol vocabulary: for every "
    f"symbol after the {BPE_MERGES} learned merges, its corpus "
    "occurrence count (word-frequency weighted) and the number of "
    "distinct words containing it — the sanity artifact a tokenizer "
    "build ships (all work rides the vocab-sized table).",
    tags=["training_prep", "bpe"],
)
def bpe_vocab_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    _bests, w = _merge_chain(spark, sf_dir)
    return (
        w.select("word", "freq", F.explode(_syms_col()).alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.sum("freq").alias("n_occurrences"),
            F.count_distinct("word").alias("n_words"),
        )
        .select(
            "symbol",
            F.length("symbol").cast("long").alias("n_chars"),
            "n_occurrences",
            "n_words",
        )
    )
