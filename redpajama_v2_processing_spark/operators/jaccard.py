"""N-gram Jaccard similarity (exact verification stage for LSH candidates,
and standalone similarity queries).

Set semantics: shingle sets are distinct word n-grams of the normalized
text (same shingling as MinHash, operators/minhash_lsh.py), so the LSH
signature approximates exactly this Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash_lsh import with_shingles, candidate_edges, minhash_bands
from ..config import ORACLE_MINHASH
from ..functions.signals import ratio6


def _jaccard(a, b):
    """round(|A∩B| / |A∪B|, 6) in the exact ratio6 contract (integer
    Jaccard ratios hit half-way rounding boundaries systematically)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return ratio6(inter, union)


def jaccard_vs_query(
    docs: DataFrame,
    id_col: str,
    query_shingles: list[str],
    text_col: str = "text",
    n: int = 3,
    min_sim: float = 0.0,
) -> DataFrame:
    """DF(id, jaccard) of every doc vs a fixed query shingle set.

    The query set ships as a literal array (broadcast by value): a
    single-pass scan, no shuffle, no join.
    """
    q = F.array(*[F.lit(s) for s in sorted(set(query_shingles))])
    sh = with_shingles(docs, id_col, text_col, n)
    return (
        sh.select(
            "id",
            _jaccard(F.col("_sh"), q).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_sim)
    )


def jaccard_candidate_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    min_sim: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over LSH candidate pairs (verification stage).

    LSH prunes the O(n^2) pair space to bucket-mates; this join re-attaches
    the two shingle sets and verifies. DF(src, dst, jaccard).
    """
    sh = with_shingles(docs, id_col, text_col, cfg["shingle"]).withColumnRenamed(
        "id", "_jid"
    )
    pairs = candidate_edges(minhash_bands(docs, id_col, text_col, cfg, base))
    return (
        pairs.join(sh.withColumnRenamed("_jid", "src").withColumnRenamed("_sh", "_sh_a"), "src")
        .join(sh.withColumnRenamed("_jid", "dst").withColumnRenamed("_sh", "_sh_b"), "dst")
        .select(
            "src",
            "dst",
            _jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_sim)
    )
