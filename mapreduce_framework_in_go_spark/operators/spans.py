"""Exact duplicated-substring detection — the ExactSubstr pass of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022), re-expressed as relational dataflow.

MinHash/SimHash (operators/dedup.py) decide WHOLE documents are
near-duplicates; this finds the duplicated *regions* — boilerplate
headers, quoted passages, templated spans — so a pipeline can scrub the
span and keep the rest of the document. Lee et al. build a suffix array
over the concatenated corpus; that is a sequential single-machine
construction. The relational formulation below reaches the same
fixed-window answer with two shuffles and no suffix array:

1. tokenize each document (the shared letter-run contract,
   ``functions/text.py:TOKEN_SPLIT_RE``) and emit every W-token rolling
   window with its 1-based start position — pure map work, one row per
   window;
2. a window is *duplicated* iff the identical W-gram occurs in at least
   one OTHER document (cross-document, the dedup-relevant criterion) —
   one hash shuffle on the gram string, decided per-row as
   ``min(doc_id) OVER (PARTITION BY g) <> max(doc_id) OVER ...`` so no
   second corpus pass or join-back is needed;
3. per document, maximal duplicated regions are a gaps-and-islands
   merge over flagged start positions, where an island extends while
   successive positions' W-token coverage stays contiguous —
   overlapping or touching end-to-start (``gap <= W``; a break fires
   only at a coverage hole, ``gap > W``). Merging only consecutive
   positions would emit overlapping spans that double-count the
   union; splitting at a touch would break maximality. Each island
   [p_min, p_max] covers exactly the contiguous token union
   [p_min, p_max + W - 1], and distinct islands are DISJOINT with a
   genuine hole between them. One doc_id shuffle, output is
   duplicate-volume-sized.

Scale (100 TB): the gram shuffle carries (doc_id, pos, g) where g is a
W-token string — the dominant cost, and inherent (the decision is a
global property of g). Every later step is keyed on doc_id and sized by
the number of DUPLICATED windows, not the corpus. A pathological gram
(the same boilerplate line in a billion docs) lands one hash partition
with min/max window aggregates — constant state per partition stream,
no per-pair blowup (contrast a self-join on g, which would square).
Window length W = 5 matches Lee et al.'s spirit (50 BPE tokens there;
scaled to this corpus's ~50-token documents).

Reference parity: the reference has no substring machinery; this is
part of the §7 training-data extension surface (task brief), sharing
the tokenizer contract with mrapps/wc.go's letter-run scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingles_col, tokens_col
from ..registry import register
from ..sources.tables import table

SPAN_W = 5  # rolling-window length in tokens


def _dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_spans_from(table(spark, sf_dir, "documents"))


def dup_spans_from(docs: DataFrame, keep_earliest: bool = False) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_dup_grams):
    maximal cross-document-duplicated token regions per document of a
    (doc_id, text) frame. With ``keep_earliest`` only LATER copies
    flag (the gram's min-doc_id occurrence is canonical and kept) —
    the scrub rule; default flags every sharing document (the audit
    rule)."""
    grams = docs.select(
        "doc_id",
        F.posexplode(shingles_col(tokens_col("text"), SPAN_W)).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "g")
    wg = Window.partitionBy("g")
    dup_pos = (
        grams.select(
            "doc_id",
            "pos",
            F.min("doc_id").over(wg).alias("mn"),
            F.max("doc_id").over(wg).alias("mx"),
        )
        .where(
            F.col("doc_id") > F.col("mn")
            if keep_earliest
            else F.col("mn") != F.col("mx")
        )
        .select("doc_id", "pos")
    )
    return positions_to_spans(dup_pos)


def positions_to_spans(dup_pos: DataFrame) -> DataFrame:
    """Maximal spans from a ``(doc_id, pos)`` frame of flagged W-gram
    start positions — ONE definition of the island-merge rule in the
    engine (islands_spans_ctes is its SQL twin).

    Islands merge flagged positions while their W-token coverage stays
    CONTIGUOUS — overlapping (gap <= W-1) or touching end-to-start
    (gap == W). Merging only consecutive positions would emit
    overlapping spans whose token sum double-counts the union
    (dup_frac could exceed 1); splitting at gap == W would split one
    contiguous duplicated region into two, breaking maximality. A
    break therefore fires only when gap > W (a hole)."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_pos.withColumn(
        "brk",
        F.when(
            F.coalesce(
                F.col("pos") - F.lag("pos").over(wd), F.lit(SPAN_W + 1)
            )
            > SPAN_W,
            1,
        ).otherwise(0),
    ).withColumn(
        "isl",
        F.sum("brk").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(SPAN_W - 1)).alias("span_end"),
        F.count("*").alias("n_dup_grams"),
    ).select(
        "doc_id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        "n_dup_grams",
    )


def _spans_ctes(dup_pred: str = "mn <> mx") -> str:
    """CTE chain ending at ``spans``; ``dup_pred`` selects which
    windows count as duplicated: the symmetric audit flags every doc
    that shares the gram (``mn <> mx``), the scrub keeps the earliest
    copy and flags only later ones (``doc_id > mn``)."""
    w = SPAN_W
    return f"""
  toks AS (
    SELECT doc_id, regexp_extract_all(text, '[\\p{{L}}]+') AS toks
    FROM documents
  ),
  grams AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           array_to_string(toks[i:i+{w - 1}], ' ') AS g
    FROM toks, unnest(range(1, len(toks) - {w - 2})) u(i)
    WHERE len(toks) >= {w}
  ),
  dup_pos AS (
    SELECT doc_id, pos FROM (
      SELECT doc_id, pos,
             min(doc_id) OVER (PARTITION BY g) AS mn,
             max(doc_id) OVER (PARTITION BY g) AS mx
      FROM grams
    ) WHERE {dup_pred}
  ),
  {islands_spans_ctes()}
"""


def islands_spans_ctes() -> str:
    """CTE fragment ``islands`` + ``spans`` over a preceding
    ``dup_pos(doc_id, pos)`` relation — ONE definition of the
    island-merge rule (break iff gap > W: coverage hole), shared by
    the batch span queries and the streaming probe's oracle so the
    rule can never drift between them."""
    w = SPAN_W
    return f"""islands AS (
    SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS isl
    FROM (
      SELECT doc_id, pos,
             CASE WHEN coalesce(pos - lag(pos) OVER (
                          PARTITION BY doc_id ORDER BY pos), {w + 1})
                       > {w}
                  THEN 1 ELSE 0 END AS brk
      FROM dup_pos
    )
  ),
  spans AS (
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + {w - 1} AS span_end,
           max(pos) + {w - 1} - min(pos) + 1 AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_dup_grams
    FROM islands GROUP BY doc_id, isl
  )"""


def scrub_ledger_ctes(toks_rel: str = "toks") -> str:
    """CTE fragment ``ranges`` + ``scrubbed`` over preceding ``spans``
    and ``{toks_rel}(doc_id, toks)`` relations — ONE definition of the
    scrub reassembly (keep positions covered by no span), shared by the
    dedup scrub and the span-level decontamination oracles."""
    return f"""ranges AS (
      SELECT doc_id,
             list(struct_pack(s := span_start, e := span_end)) AS rs
      FROM spans GROUP BY doc_id
    ),
    scrubbed AS (
      SELECT t.doc_id,
             len(t.toks) AS n_tokens,
             list_transform(
               list_filter(range(1, len(t.toks) + 1),
                 p -> len(list_filter(coalesce(r.rs, []),
                          x -> p BETWEEN x.s AND x.e)) = 0),
               p -> t.toks[p]) AS kept
      FROM {toks_rel} t LEFT JOIN ranges r ON r.doc_id = t.doc_id
      WHERE len(t.toks) > 0
    )"""


_SCRUB_LEDGER_SELECT = """SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(kept) AS BIGINT) AS kept_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS removed_tokens,
           md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
    FROM scrubbed"""


@register(
    "dedup_substring_spans",
    oracle=f"""
    WITH {_spans_ctes()}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end AS BIGINT) AS span_end,
           CAST(span_tokens AS BIGINT) AS span_tokens,
           n_dup_grams
    FROM spans
    """,
    doc="ExactSubstr-style duplicated-region detection: maximal token "
    f"spans whose every {SPAN_W}-token window also occurs in another "
    "document. Two shuffles (gram hash, doc_id islands); output sized "
    "by duplicate volume, not the corpus.",
    tags=["dedup", "spans"],
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dup_spans(spark, sf_dir)


@register(
    "dedup_substring_stats",
    oracle=f"""
    WITH {_spans_ctes()},
    per_doc AS (
      SELECT doc_id,
             CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
             CAST(count(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY doc_id
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           coalesce(p.n_spans, 0) AS n_spans,
           round(coalesce(p.dup_tokens, 0) / len(t.toks)::DOUBLE, 6)
             AS dup_frac
    FROM toks t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    WHERE len(t.toks) > 0
    """,
    doc="Per-document scrub ledger for the substring pass: token count, "
    "tokens covered by duplicated spans (spans are disjoint after the "
    "island merge, so the sum IS the union size), span count, and the "
    "duplicated fraction a scrub would remove. Docs with no duplicated "
    "span appear with zeros — the left join keeps the ledger total.",
    tags=["dedup", "spans"],
)
def dedup_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tok = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    per_doc = _dup_spans(spark, sf_dir).groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count("*").alias("n_spans"),
    )
    return n_tok.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_frac"),
    )


@register(
    "dedup_substring_scrub",
    oracle=f"""
    WITH {_spans_ctes(dup_pred="doc_id > mn")},
    {scrub_ledger_ctes()}
    {_SCRUB_LEDGER_SELECT}
    """,
    doc="The ExactSubstr scrub itself (Lee et al. keep ONE occurrence): "
    "spans flag only where an EARLIER document (smaller doc_id) holds "
    "the same window, so each duplicated region survives exactly in "
    "its canonical first document; later copies are cut out of the "
    "token stream and the kept remainder is emitted as count + digest "
    "(the digest, not the text, keeps hash-checked output bounded). "
    "Per-row reassembly is O(n_tokens * n_ranges) with ranges per doc "
    "tiny by construction (disjoint maximal spans).",
    tags=["dedup", "spans"],
)
def dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return scrub_ledger_frame(docs, dup_spans_from(docs, keep_earliest=True))


def scrub_ledger_frame(docs: DataFrame, span_frame: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, removed_tokens, kept_md5): cut
    every token covered by a span of ``span_frame`` out of each doc's
    token stream and emit the kept remainder as count + digest — ONE
    definition of the scrub reassembly (scrub_ledger_ctes is its SQL
    twin). Per-row reassembly is O(n_tokens * n_ranges) with ranges
    per doc tiny by construction (disjoint maximal spans)."""
    ranges = (
        span_frame
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            ).alias("rs")
        )
    )
    toks = docs.select("doc_id", tokens_col("text").alias("toks")).where(
        F.size("toks") > 0
    )
    rs = F.coalesce(
        "rs", F.array().cast("array<struct<s:bigint,e:bigint>>")
    )
    kept = F.transform(
        F.filter(
            F.sequence(F.lit(1).cast("long"), F.size("toks").cast("long")),
            lambda p: ~F.exists(
                rs, lambda x: p.between(x["s"], x["e"])
            ),
        ),
        lambda p: F.try_element_at("toks", p.cast("int")),
    )
    return (
        toks.join(ranges, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.size("kept")).cast("long").alias(
                "removed_tokens"
            ),
            F.md5(F.array_join("kept", " ")).alias("kept_md5"),
        )
    )


# Boilerplate guard for the pairwise join: a gram occurring in K docs
# yields K^2 occurrence pairs, so ultra-common grams (true boilerplate)
# are excluded from PAIR ATTRIBUTION (the per-doc span queries above
# still count them). 64 bounds the blowup at 64^2 rows per gram while
# keeping every genuinely shared passage — the same move Lee et al.
# make by ignoring ultra-frequent spans. The oracle applies the
# identical cap, so parity is exact.
LCS_DF_CAP = 64


@register(
    "dedup_span_lcs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '[\\p{{L}}]+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[i:i+{SPAN_W - 1}], ' ') AS g
      FROM toks, unnest(range(1, len(toks) - {SPAN_W - 2})) u(i)
      WHERE len(toks) >= {SPAN_W}
    ),
    bounded AS (
      SELECT * FROM (
        SELECT doc_id, pos, g,
               count(DISTINCT doc_id) OVER (PARTITION BY g) AS df
        FROM grams
      ) WHERE df BETWEEN 2 AND {LCS_DF_CAP}
    ),
    occ AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, a.pos - b.pos AS diag, a.g
      FROM bounded a JOIN bounded b
        ON a.g = b.g AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT doc_a, doc_b, diag,
             sum(brk) OVER (PARTITION BY doc_a, doc_b, diag
                            ORDER BY pos_a ROWS UNBOUNDED PRECEDING)
               AS run_id, pos_a
      FROM (
        SELECT doc_a, doc_b, diag, pos_a,
               CASE WHEN coalesce(pos_a - lag(pos_a) OVER (
                            PARTITION BY doc_a, doc_b, diag
                            ORDER BY pos_a), 2) > 1
                    THEN 1 ELSE 0 END AS brk
        FROM (SELECT DISTINCT doc_a, doc_b, diag, pos_a FROM occ)
      )
    ),
    run_lens AS (
      SELECT doc_a, doc_b, CAST(count(*) + {SPAN_W - 1} AS BIGINT)
               AS run_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run_id
    )
    SELECT o.doc_a, o.doc_b,
           CAST(count(DISTINCT o.g) AS BIGINT) AS n_shared_grams,
           max(r.lcs_tokens) AS lcs_tokens
    FROM occ o
    JOIN (SELECT doc_a, doc_b, max(run_tokens) AS lcs_tokens
          FROM run_lens GROUP BY doc_a, doc_b) r
      USING (doc_a, doc_b)
    GROUP BY o.doc_a, o.doc_b
    """,
    doc="Pairwise longest common passage: for every document pair "
    f"sharing a (non-boilerplate, df <= {LCS_DF_CAP}) {SPAN_W}-gram, "
    "the length in tokens of their longest shared contiguous run — "
    "computed relationally as diagonal islands (matching occurrences "
    "with equal pos_a - pos_b merge while consecutive), never an "
    "actual LCS dynamic program. The per-pair evidence a scrub "
    "reviewer reads: n_shared_grams says how MUCH is shared, "
    "lcs_tokens says how LONG the biggest block is. Pair fan-out is "
    "bounded by duplicate volume with the df cap guarding the "
    "boilerplate square.",
    tags=["dedup", "spans"],
)
def dedup_span_lcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.posexplode(shingles_col(tokens_col("text"), SPAN_W)).alias(
            "pos0", "g"
        ),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "g")
    # df per gram via two-phase aggregation (bounded-memory partial agg),
    # never a window collect_set: a boilerplate gram occurring in millions
    # of documents would otherwise materialize a multi-million-element set
    # per occurrence row in the window buffer. Same pattern as text_tfidf.
    df_ok = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df").between(2, LCS_DF_CAP))
        .select("g")
    )
    bounded = grams.join(df_ok, "g")
    a = bounded.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "g"
    )
    b = bounded.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "g"
    )
    occ = (
        a.join(b, "g")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "pos_a",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"), "g",
        )
    )
    dpos = occ.select("doc_a", "doc_b", "diag", "pos_a").distinct()
    wd = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = dpos.withColumn(
        "brk",
        F.when(
            F.coalesce(F.col("pos_a") - F.lag("pos_a").over(wd), F.lit(2))
            > 1,
            1,
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("brk").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    run_lens = runs.groupBy("doc_a", "doc_b", "diag", "run_id").agg(
        (F.count("*") + F.lit(SPAN_W - 1)).cast("long").alias("run_tokens")
    )
    lcs = run_lens.groupBy("doc_a", "doc_b").agg(
        F.max("run_tokens").alias("lcs_tokens")
    )
    shared = occ.groupBy("doc_a", "doc_b").agg(
        F.count_distinct("g").alias("n_shared_grams")
    )
    return shared.join(lcs, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "n_shared_grams", "lcs_tokens"
    )
