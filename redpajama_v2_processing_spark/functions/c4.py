"""C4-style cleaning (Raffel et al. 2020, the public T5 corpus recipe),
re-expressed as native Spark Column expressions:

* line retention: keep lines with >= ``min_line_words`` words that end in
  terminal punctuation (. ! ? or a closing quote);
* page filters: drop pages with fewer than ``min_lines`` retained lines,
  any curly brace (code), or the phrase "lorem ipsum" (boilerplate).

Everything is an array/regex expression over the staged line array — no
shuffle, no Python; the same filter runs identically in the DuckDB
oracle. (The reference pipeline consumes RedPajama's precomputed signal
surface; C4 is the other canonical public web-cleaning recipe, included
for pipeline completeness.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import lines, tokens

C4_MIN_LINE_WORDS = 5
C4_MIN_LINES = 3
C4_TERMINAL = r'[.!?"]\s*$'


def c4_kept_lines(text: Column, min_line_words: int = C4_MIN_LINE_WORDS) -> Column:
    """Array of lines surviving the C4 line rule."""
    return F.filter(
        lines(text),
        lambda l: (F.size(tokens(l)) >= min_line_words) & l.rlike(C4_TERMINAL),
    )


def c4_page_keep(text: Column, kept: Column, min_lines: int = C4_MIN_LINES) -> Column:
    """Boolean: page survives the C4 page-level rules."""
    return (
        (F.size(kept) >= min_lines)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )


def c4_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_line_words: int = C4_MIN_LINE_WORDS,
    min_lines: int = C4_MIN_LINES,
) -> DataFrame:
    """DF(id, clean_text): pages passing the C4 rules, with only their
    retained lines rejoined — the classic public web-cleaning recipe as
    one narrow projection + filter (fully pushed into the scan stage)."""
    staged = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t"),
        c4_kept_lines(F.col(text_col), min_line_words).alias("_kept"),
    )
    return (
        staged.where(c4_page_keep(F.col("_t"), F.col("_kept"), min_lines))
        .select("id", F.array_join("_kept", "\n").alias("clean_text"))
    )
