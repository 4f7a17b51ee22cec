"""Per-document unigram entropy (the reference's ``unigram_entropy``
signal, /root/reference/README.md:78) as a distributed plan.

entropy(doc) = ln(N) - sum_t c_t*ln(c_t) / N  over token counts c_t.

Plan: explode -> two-level hash aggregation. Both aggregations are
partial-agg friendly (map-side combine), so the shuffle carries only
(doc, token) partial counts, not raw tokens.

Cross-engine contract: the per-token ``ln(c)`` terms are quantized to
integer MICRO-UNITS before summing (``sum(c * round(ln(c)*1e6))`` as
bigint) — the same idiom as the perplexity LM — so the sum is
order-independent and bit-identical across Spark's and DuckDB's
reduction orders; a raw double sum is addition-order-dependent and can
flip the rounded output's last digit between engines. The final round
uses the deterministic floor idiom (vectors.round_half_up), which also
yields +0.0 (never -0.0) on one-distinct-token docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..functions.vectors import round_half_up


def unigram_entropy(docs: DataFrame, id_col: str, text_col: str = "text",
                    round_to: int = 6) -> DataFrame:
    """DF(id_col, unigram_entropy). Empty docs get 0.0."""
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    micro_ln = F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("bigint")
    ent = counts.groupBy(id_col).agg(
        round_half_up(
            F.log(F.sum("c").cast("double"))
            - (F.sum(F.col("c") * micro_ln).cast("double") / F.lit(1e6))
            / F.sum("c").cast("double"),
            round_to,
        ).alias("unigram_entropy")
    )
    return docs.select(id_col).join(ent, id_col, "left").select(
        id_col, F.coalesce("unigram_entropy", F.lit(0.0)).alias("unigram_entropy")
    )
