"""C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the
"Colossal Clean Crawled Corpus" heuristics): keep only lines that end
in a terminal punctuation mark and have >= 5 words, drop lines
mentioning javascript, and drop whole pages that retain fewer than 3
sentences, contain "lorem ipsum", or contain a curly brace. Together
with the Gopher rules (operators/textops.py) this covers the two
published web-cleaning stacks a pretraining pipeline actually runs.

The synthetic corpus is a flat word salad — no newlines, no
punctuation (TESTDATA.md) — so a literal line split would be 100%
degenerate. Following the multimodal precedent (mm_* queries derive
codec payloads from doc text), each document first synthesizes a
deterministic STRUCTURED PAGE from its own tokens: tokens scatter
round-robin-by-hash into 12 lines (variable line lengths fall out of
the multinomial), each line gets a hash-chosen terminal/non-terminal
ending, a 1-in-13 hash of lines is prefixed with "javascript ", and a
deterministic sliver of documents gets "lorem ipsum" / "{" markers
planted. The SYNTHESIS is a fixture generator replayed identically by
the DuckDB oracle; the C4 RULES are the operator under test, and every
rule fires with real signal on the synthesized pages (line lengths
straddle the 5-word bound, ~70% of endings are terminal).

Scale (100 TB): zero shuffles — everything is per-document HOF map
work over the corpus scan, same discipline as gopher_quality_flags.
Shared HOF-derived arrays (the tagged token list, the line list, the
kept-line list) are staged through explode(array(...)) Generates so
project collapse cannot re-inline them per consumer (the documented
subexpression-elimination exclusion for lambda bodies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_long32, tokens_col
from ..registry import register
from ..sources.tables import table

C4_NLINES = 12  # synthesized lines per page
C4_MIN_WORDS = 5  # C4: drop lines with fewer than 5 words
C4_MIN_SENTENCES = 3  # C4: drop pages retaining fewer than 3 sentences
JS_MOD = 13  # 1-in-13 lines get the "javascript " prefix
LOREM_MOD = 37  # doc_id % 37 == 0 pages get " lorem ipsum" planted
BRACE_MOD = 41  # doc_id % 41 == 0 pages get " {" planted


def _h_sql(salt: str, a: str, b: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}:' || CAST({a} AS VARCHAR) || ':' "
        f"|| CAST({b} AS VARCHAR)), 1, 8))::BIGINT"
    )


_PUNCT_SQL = f"""CASE {_h_sql('P', 'doc_id', 'lid')} % 10
             WHEN 6 THEN '!' WHEN 7 THEN '?' WHEN 8 THEN ''
             WHEN 9 THEN ':' ELSE '.' END"""

_KEEP_SQL = (
    "(ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')) "
    f"AND length(l) - length(replace(l, ' ', '')) + 1 >= {C4_MIN_WORDS} "
    "AND NOT contains(l, 'javascript')"
)


@register(
    "c4_line_scrub",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '[\\p{{L}}]+') AS toks
      FROM documents
    ),
    tg AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) + 1), i -> struct_pack(
               lid := {_h_sql('L', 'doc_id', 'i - 1')} % {C4_NLINES},
               t := toks[CAST(i AS INTEGER)])) AS tagged
      FROM t
    ),
    ln AS (
      SELECT doc_id,
             list_transform(range(0, {C4_NLINES}), lid ->
               CASE WHEN {_h_sql('J', 'doc_id', 'lid')} % {JS_MOD} = 0
                    THEN 'javascript ' ELSE '' END
               || coalesce(array_to_string(list_transform(
                    list_filter(tagged, x -> x.lid = lid), x -> x.t),
                    ' '), '')
               || CASE WHEN lid = 0 AND doc_id % {LOREM_MOD} = 0
                       THEN ' lorem ipsum' ELSE '' END
               || CASE WHEN lid = 1 AND doc_id % {BRACE_MOD} = 0
                       THEN ' {{' ELSE '' END
               || {_PUNCT_SQL}) AS lines
      FROM tg
    ),
    k AS (
      SELECT doc_id, lines,
             list_filter(lines, l -> {_KEEP_SQL}) AS kept,
             len(list_filter(lines,
                 l -> contains(l, 'lorem ipsum'))) > 0 AS has_lorem,
             len(list_filter(lines,
                 l -> contains(l, '{{'))) > 0 AS has_brace
      FROM ln
    )
    SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_kept,
           has_lorem,
           has_brace,
           len(kept) >= {C4_MIN_SENTENCES}
             AND NOT has_lorem AND NOT has_brace AS c4_keep,
           md5(coalesce(array_to_string(kept, chr(10)), ''))
             AS scrubbed_md5
    FROM k
    """,
    doc="The published C4 cleaning rules (Raffel et al. 2020 §2.2) as "
    "a per-document line scrub + page gate over deterministically "
    "synthesized structured pages (module docstring): line kept iff "
    f"terminal-punctuation ending AND >= {C4_MIN_WORDS} words AND no "
    f"'javascript'; page kept iff >= {C4_MIN_SENTENCES} retained "
    "sentences AND no 'lorem ipsum' AND no curly brace. Emits the "
    "retained-line count, both page flags, the page verdict, and the "
    "md5 of the scrubbed page (kept lines newline-joined — the "
    "byte-exact artifact a real scrub would write). Shuffle-free "
    "map-only HOF work; the oracle replays synthesis AND rules in "
    "DuckDB, so every rule is hash-checked end to end.",
    tags=["textops", "llm-pipeline"],
)
def c4_line_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")

    def h(salt: str, a, b) -> F.Column:
        return md5_long32(
            F.concat(
                F.lit(f"{salt}:"),
                a.cast("string"),
                F.lit(":"),
                b.cast("string"),
            )
        )

    t1 = docs.select("doc_id", tokens_col("text").alias("toks"))
    # stage the tagged token list behind a Generate (shared HOF array)
    t2 = t1.select(
        "doc_id",
        F.explode(
            F.array(
                F.transform(
                    "toks",
                    lambda t, i: F.struct(
                        F.pmod(
                            h("L", F.col("doc_id"), i), F.lit(C4_NLINES)
                        ).alias("lid"),
                        t.alias("t"),
                    ),
                )
            )
        ).alias("tagged"),
    )

    def line_of(lid: F.Column) -> F.Column:
        body = F.coalesce(
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("tagged"), lambda x: x["lid"] == lid
                    ),
                    lambda x: x["t"],
                ),
                " ",
            ),
            F.lit(""),
        )
        js = F.when(
            F.pmod(h("J", F.col("doc_id"), lid), F.lit(JS_MOD)) == 0,
            F.lit("javascript "),
        ).otherwise("")
        lor = F.when(
            (lid == 0) & (F.col("doc_id") % LOREM_MOD == 0),
            F.lit(" lorem ipsum"),
        ).otherwise("")
        br = F.when(
            (lid == 1) & (F.col("doc_id") % BRACE_MOD == 0),
            F.lit(" {"),
        ).otherwise("")
        hp = F.pmod(h("P", F.col("doc_id"), lid), F.lit(10))
        punct = (
            F.when(hp == 6, F.lit("!"))
            .when(hp == 7, F.lit("?"))
            .when(hp == 8, F.lit(""))
            .when(hp == 9, F.lit(":"))
            .otherwise(".")
        )
        return F.concat(js, body, lor, br, punct)

    # stage the line list behind a second Generate
    t3 = t2.select(
        "doc_id",
        F.explode(
            F.array(
                F.transform(
                    F.sequence(F.lit(0), F.lit(C4_NLINES - 1)),
                    lambda lid: line_of(lid),
                )
            )
        ).alias("lines"),
    )

    def keeps(line: F.Column) -> F.Column:
        words = (
            F.length(line)
            - F.length(F.replace(line, F.lit(" "), F.lit("")))
            + 1
        )
        return (
            (
                line.endswith(".")
                | line.endswith("!")
                | line.endswith("?")
            )
            & (words >= C4_MIN_WORDS)
            & ~line.contains("javascript")
        )

    # stage kept + page flags (all reused downstream) behind a third
    t4 = t3.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.filter(F.col("lines"), keeps).alias("kept"),
                    F.exists(
                        F.col("lines"),
                        lambda l: l.contains("lorem ipsum"),
                    ).alias("has_lorem"),
                    F.exists(
                        F.col("lines"), lambda l: l.contains("{")
                    ).alias("has_brace"),
                )
            )
        ).alias("s"),
    )
    n_kept = F.size("s.kept").cast("long")
    return t4.select(
        "doc_id",
        n_kept.alias("n_kept"),
        F.col("s.has_lorem").alias("has_lorem"),
        F.col("s.has_brace").alias("has_brace"),
        (
            (n_kept >= C4_MIN_SENTENCES)
            & ~F.col("s.has_lorem")
            & ~F.col("s.has_brace")
        ).alias("c4_keep"),
        F.md5(F.array_join(F.col("s.kept"), "\n")).alias("scrubbed_md5"),
    )
