"""Per-document unigram entropy (the reference's ``unigram_entropy``
signal, /root/reference/README.md:78) as a distributed plan.

entropy(doc) = ln(N) - sum_t c_t*ln(c_t) / N  over token counts c_t.

Plan: explode -> two-level hash aggregation. Both aggregations are
partial-agg friendly (map-side combine), so the shuffle carries only
(doc, token) partial counts, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def unigram_entropy(docs: DataFrame, id_col: str, text_col: str = "text",
                    round_to: int = 6) -> DataFrame:
    """DF(id_col, unigram_entropy). Empty docs get 0.0."""
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    # `+ 0.0` normalizes IEEE negative zero (round of a ~-1e-17 residual on
    # one-distinct-token docs) so both engines emit +0.0 at any reduction order.
    ent = counts.groupBy(id_col).agg(
        (F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double"),
            round_to,
        ) + F.lit(0.0)).alias("unigram_entropy")
    )
    return docs.select(id_col).join(ent, id_col, "left").select(
        id_col, F.coalesce("unigram_entropy", F.lit(0.0)).alias("unigram_entropy")
    )
