"""DSIR-style importance weights for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", public
paper): score every raw document by how target-like its hashed-n-gram
distribution is, then keep the top mass.

log w(x) = sum over feature buckets b of c_b(x) * (ln p_b - ln q_b),
where c_b(x) are the doc's hashed unigram+bigram counts, p is the
add-one-smoothed bucket distribution of a TARGET corpus and q of the RAW
corpus.

Plan shape (all JVM-native): two grouped counts build the B-bucket
distributions (B rows each — broadcast); the per-doc score is one join
against the broadcast ratio table and one integer aggregation. The ratio
is stored in integer micro-units (round(Δln * 1e6)), so the per-doc sum
is an exact integer — independent of summation order, identical in the
DuckDB oracle. At 100 TB the raw-side count and the scoring pass are the
only corpus scans; everything else is O(B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int
from ..functions.text import tokens, word_ngrams

DSIR_BUCKETS = 64  # oracle profile; production uses ~10k buckets


def hashed_ngram_buckets(
    docs: DataFrame, id_col: str, text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DF(id, bucket, c): per-doc counts of hashed word uni+bigrams."""
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= 1)
    uni = base.select("id", F.explode("_t").alias("_g"))
    # word_ngrams' zip_with formulation stays linear under Catalyst
    # (functions/text.py:45 documents the O(len^2) inlining hazard of the
    # transform/sequence shape this previously hand-rolled)
    bi = base.where(F.size("_t") >= 2).select(
        "id", F.explode(word_ngrams(F.col("_t"), 2)).alias("_g")
    )
    return (
        uni.unionByName(bi)
        .select("id", (md5int(F.col("_g")) % buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _bucket_dist(grams: DataFrame, buckets: int) -> DataFrame:
    """DF(bucket, n) over ALL bucket ids 0..B-1 (zero-filled)."""
    counts = grams.groupBy("bucket").agg(F.sum("c").alias("n"))
    full = grams.sparkSession.range(buckets).select(
        F.col("id").alias("bucket")
    )
    return full.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    target_text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DF(id, log_weight): per-doc DSIR importance log-weight. Docs with
    no tokens score 0.0. Exact: the broadcast ratio table stores
    round((ln p_b - ln q_b) * 1e6) as bigint, so each doc's weight is an
    integer sum divided once.

    The per-doc bucket frame is checkpointed once: it feeds the raw
    distribution AND the scoring join (Catalyst does not share the
    subplan — 11 corpus scans measured without it)."""
    dg = hashed_ngram_buckets(docs, id_col, text_col, buckets).localCheckpoint(
        eager=True
    )
    tg = hashed_ngram_buckets(target, target.columns[0], target_text_col, buckets)
    q = _bucket_dist(dg, buckets)
    p = _bucket_dist(tg, buckets)
    qt = q.agg(F.sum("n").alias("tq"))
    pt = p.agg(F.sum("n").alias("tp"))
    ratio = (
        p.withColumnRenamed("n", "np")
        .join(q.withColumnRenamed("n", "nq"), "bucket")
        .crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(qt))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("np") + 1).cast("double") / (F.col("tp") + buckets).cast("double"))
                    - F.log((F.col("nq") + 1).cast("double") / (F.col("tq") + buckets).cast("double"))
                ) * 1e6
            ).cast("bigint").alias("r"),
        )
    )
    scored = (
        dg.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg((F.sum(F.col("c") * F.col("r")) / F.lit(1e6)).alias("_lw"))
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id", F.coalesce("_lw", F.lit(0.0)).alias("log_weight")
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    k: int,
    text_col: str = "text",
    target_text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DF(id, log_weight): the k most target-like docs (ties by id) —
    deterministic top-k selection; swap in Gumbel noise seeded per id for
    the paper's sampled variant."""
    w = dsir_log_weights(docs, target, id_col, text_col, target_text_col, buckets)
    return w.orderBy(F.col("log_weight").desc(), F.col("id").asc()).limit(k)
