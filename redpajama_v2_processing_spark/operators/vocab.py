"""Corpus vocabulary statistics — the tokenizer-prep surface.

A training-data pipeline sizes its tokenizer (and its OOV/byte-fallback
budget) from corpus token-frequency statistics: the head of the Zipf
curve and how much occurrence mass a top-V vocabulary covers. The
reference consumes these decisions pre-made (its fastText/KenLM models
ship with fixed vocabularies, README.md:78); the engine computes them
in-corpus.

Scale shape: one explode + one partially-aggregated groupBy over tokens
(the vocab table is distinct tokens — orders of magnitude smaller than
the corpus); top-k via orderBy+limit compiles to TakeOrdered (per-
partition heaps + driver merge of k rows, no global sort shuffle). The
only window runs over the k-row result frame, and the 1-row total joins
by broadcast. Cumulative sums stay exact bigints; the single division
happens per output row, so coverage is order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.signals import ratio6
from ..functions.text import normalize, tokens

COVERAGE_ROUND = 6


def token_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """DF(tok, cnt): corpus token-frequency table over normalized
    whitespace tokens. Null/empty docs contribute no rows."""
    return (
        docs.select(F.explode(tokens(normalize(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def vocab_coverage(
    docs: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """DF(tok, cnt, rank, coverage): the k most frequent tokens (ties
    broken by token string, so the cut is deterministic) with their
    occurrence counts, 1-based frequency rank, and the cumulative
    fraction of ALL token occurrences a vocabulary truncated at that
    rank covers (rounded to 6 decimals)."""
    # freq feeds both the total and the top-k; Catalyst does not share
    # subplans, so checkpoint the vocab-sized table to keep ONE corpus scan
    freq = token_frequencies(docs, text_col).localCheckpoint(eager=True)
    total = freq.agg(F.sum("cnt").alias("_total"))
    top = freq.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(k)
    # window over the k-row top frame only — never the full vocab table
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "coverage",
            ratio6(
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
                F.col("_total"),
                COVERAGE_ROUND,
            ),
        )
        .select("tok", "cnt", "rank", "coverage")
    )


def oov_rate(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 100
) -> DataFrame:
    """DF(vocab_size, total_tokens, oov_tokens, oov_rate): the fraction
    of token OCCURRENCES falling outside the top-``vocab_size``
    vocabulary (the byte-fallback / <unk> budget a tokenizer of that
    size pays on this corpus). One aggregation over the frequency
    table; the vocab cut reuses the deterministic (cnt desc, tok asc)
    order."""
    # one corpus scan: the distinct-token table backs both aggregates
    freq = token_frequencies(docs, text_col).localCheckpoint(eager=True)
    top = freq.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(vocab_size)
    in_vocab = top.agg(F.sum("cnt").alias("_in"))
    total = freq.agg(F.sum("cnt").alias("_total"))
    return (
        total.crossJoin(F.broadcast(in_vocab))
        .select(
            F.lit(vocab_size).cast("long").alias("vocab_size"),
            F.col("_total").alias("total_tokens"),
            (F.col("_total") - F.col("_in")).alias("oov_tokens"),
            ratio6(
                F.col("_total") - F.col("_in"), F.col("_total"), COVERAGE_ROUND
            ).alias("oov_rate"),
        )
    )
