"""Scalar text functions (all JVM-side built-ins — no Python UDFs).

Tokenization parity contract: the reference tokenizes into maximal
Unicode-letter runs via ``strings.FieldsFunc(contents, !unicode.IsLetter)``
(``mrapps/wc.go:22-26``, ``mrapps/indexer.go:22``). Java regex ``\\p{L}``
(Spark `split`) and RE2 ``\\p{L}`` (DuckDB oracle) both mean Unicode
category L, so splitting on ``[^\\p{L}]+`` and dropping empties is
byte-identical across engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split on maximal non-letter runs == keep maximal letter runs.
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def tokens_col(text: Column | str) -> Column:
    """Array of non-empty Unicode-letter-run tokens (case preserved,
    exactly like the reference apps — no lowercasing)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def md5_long32(col: Column) -> Column:
    """Deterministic 32-bit non-negative hash: first 8 hex chars of md5.

    Chosen over xxhash64/murmur because the DuckDB oracle can reproduce it
    exactly (``('0x' || substr(md5(s),1,8))::BIGINT``), which makes
    MinHash/SimHash pipelines mechanically oracle-checkable. Still a
    uniform hash — fine for sketching; swap for xxhash64 when oracle
    parity is not needed (it is ~3x faster).
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def shingles_col(tokens: Column, n: int) -> Column:
    """Word n-gram shingles from a token array, as ' '-joined strings.

    Built as a zip_with chain over n shifted slices rather than a
    per-position ``transform(sequence, i -> slice(...))``: lambda
    bodies are excluded from Spark's subexpression elimination, so a
    per-position formulation re-evaluates the ``tokens`` expression
    (often a regex split) once per POSITION — O(len^2) per row. The
    zip_with chain references ``tokens`` only n+2 times and does one
    O(len) pass per shingle word. Length < n yields an empty array.
    """
    m = F.size(tokens) - (n - 1)  # number of shingles
    acc = F.slice(tokens, 1, m)
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(tokens, k, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(F.size(tokens) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )
