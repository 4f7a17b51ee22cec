"""Text primitives as native Spark Column expressions.

Replaces the reference's per-row Python text handling (HF ``map`` callables,
e.g. /root/reference/src/filter_exact_duplicates.py:69-79) with JVM-side,
whole-stage-codegen-friendly expressions. No Python executes per row.

Tokenization contract (shared with the DuckDB oracle, see ``oracle.py``):
``tokens(text) = split(trim(text), r'\\s+')`` and the empty string yields an
empty array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_ws(col: Column) -> Column:
    """Strip leading/trailing \\s (trim() only strips ASCII spaces, not
    \\n/\\t, in Spark AND DuckDB). Anchored regexes, codegen-capable."""
    return F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens: strip outer whitespace, split on \\s+ runs;
    blank text -> empty array. No higher-order functions — a filter()
    lambda here would drop the whole signal projection out of
    whole-stage codegen (HOFs are CodegenFallback)."""
    c = F.col(col) if isinstance(col, str) else col
    t = strip_ws(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def lines(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "\n")


def word_ngrams(tok: Column, n: int) -> Column:
    """Word n-grams joined by single spaces; fewer than n tokens -> empty."""
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    parts = lambda i: [F.element_at(tok, i + k) for k in range(n)]  # noqa: E731
    gram = lambda i: F.concat_ws(" ", *parts(i))  # noqa: E731
    return F.when(F.size(tok) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, gram)
    )


def char_ngrams(col: Column | str, n: int) -> Column:
    """Character n-grams; shorter text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - (n - 1))
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: c.substr(i, F.lit(n)))
    )


def normalize(col: Column | str) -> Column:
    """Deterministic normal form used for fingerprints / exact dedup:
    lowercase, collapse whitespace runs to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_hex(col: Column | str) -> Column:
    """md5 hex of the normalized text (portable across engines)."""
    return F.md5(normalize(col))


def fingerprint_int(col: Column | str) -> Column:
    """60-bit integer fingerprint: first 15 hex chars of md5 as bigint.
    Portable: DuckDB computes the identical value (see oracle.sql_md5int)."""
    return F.conv(F.substring(fingerprint_hex(col), 1, 15), 16, 10).cast("bigint")
