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


def _zip_ngrams(arr: Column, n: int, sep: str) -> Column:
    """n-grams of an array via zip_with over n shifted slices.

    CRITICAL shape: zip_with/slice evaluate their array CHILDREN once per
    row; the obvious ``transform(sequence(...), i -> element_at(arr, i+k))``
    re-evaluates ``arr`` per element — O(len^2) per row whenever Catalyst
    inlines the array expression (e.g. filter pushdown through the staging
    projection substitutes the split() back into the predicate). The zip
    formulation stays linear even fully inlined.

    Trailing positions pair with null -> null gram (concat null-propagates);
    array_compact drops them, leaving exactly max(len-n+1, 0) grams.
    """
    cur = arr
    for k in range(1, n):
        # slice length may exceed the remainder; Spark returns what's there
        shifted = F.slice(arr, k + 1, F.size(arr))
        if sep:
            cur = F.zip_with(cur, shifted, lambda a, b: F.concat(a, F.lit(sep), b))
        else:
            cur = F.zip_with(cur, shifted, lambda a, b: F.concat(a, b))
    return F.array_compact(cur)


def word_ngrams(tok: Column, n: int) -> Column:
    """Word n-grams joined by single spaces; fewer than n tokens -> empty."""
    if n == 1:
        return tok
    return F.when(F.size(tok) < n, F.array().cast("array<string>")).otherwise(
        _zip_ngrams(tok, n, " ")
    )


def char_ngrams(col: Column | str, n: int) -> Column:
    """Character n-grams; shorter text -> empty array.

    ONE transform(sequence) pass of substring slices — measured ~1.8x
    faster than the previous split("") + (n-1) chained zip_with levels
    (each level allocated an intermediate array and re-concatenated every
    gram; n-gram output verified element-identical). Pass a PLAIN column
    reference: the lambda evaluates ``col`` per element, which is a field
    read for an attribute but O(len * expr) if a synthesized-text
    expression is inlined here (same staging rule as word_ngrams)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c) - (n - 1)),
            lambda i: F.substring(c, i, n),
        )
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


# BPE-ish subword pattern: letter runs, digit runs, single non-alnum marks
# (the classic pre-tokenizer split; same subset works in Java regex and
# RE2, so the count is oracle-portable). A real BPE merges within these
# pieces, so this is a deterministic upper bound ~ proportional to BPE
# token counts — the cheap per-doc budget signal a curation pipeline needs.
SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count (same contract as tokens())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(tokens(c)).cast("long")


def subword_count(col: Column | str) -> Column:
    """Count of BPE-ish subword pieces (SUBWORD_PATTERN matches)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(SUBWORD_PATTERN), 0)).cast("long")
