"""Perplexity scoring (KenLM-style n-gram LM, re-expressed distributively).

The reference consumes a precomputed ``perplexity`` signal
(/root/reference/README.md:78). Here the LM itself is built *inside* Spark:

* ``unigram``: corpus token frequencies via one hash aggregation; scoring is
  an explode -> broadcast-join(vocab) -> re-aggregate. Fully native,
  SQL-expressible (oracle-checked).
* ``char_bigram``: add-one-smoothed character bigram LM; counts built with a
  hash aggregation, scored by an Arrow-batched pandas UDF over a broadcast
  probability dict (the model is tiny; documents are not). This mirrors
  "KenLM model broadcast to executors" at cluster scale.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .text import tokens, char_ngrams


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """DF(token, logp): corpus unigram log-probabilities (natural log)."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("c").cast("double") / F.col("t").cast("double")).alias("logp")
    )


def with_unigram_perplexity(
    docs: DataFrame, id_col: str, text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Append ``perplexity`` = exp(-mean token logp) per document.

    Plan shape: explode -> broadcast join on the (small) vocab -> hash
    re-aggregate on the doc id. The vocab is broadcast; the corpus never
    shuffles except for the per-doc re-aggregation, which is partial-agg
    (map-side combine) friendly.
    """
    model = unigram_model(docs, text_col)
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    scored = tok.join(F.broadcast(model), "token")
    per_doc = scored.groupBy(id_col).agg(
        F.exp(-F.avg("logp")).alias("_ppl")
    )
    return docs.join(per_doc, id_col, "left").withColumn(
        "perplexity", F.round(F.coalesce(F.col("_ppl"), F.lit(0.0)), round_to)
    ).drop("_ppl")


def with_bigram_perplexity(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    lam: float = 0.75,
    round_to: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Append ``perplexity_bigram``: interpolated word-bigram LM perplexity
    — the KenLM-shaped higher-order signal (the reference's perplexity is a
    KenLM n-gram LM, /root/reference/README.md:78); the unigram scorer
    above is the order-1 fallback.

    Model (trained on the scored corpus itself, like unigram_model):
        p(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/T
    i.e. bigram MLE interpolated with the unigram distribution — Jelinek-
    Mercer smoothing, the standard backoff family KenLM interpolates with.
    Doc score = exp(-mean ln p) over the doc's len-1 bigram positions;
    docs with < 2 tokens score 0.0.

    Plan shape (all JVM-native, zero Python):
    * bigrams per doc via an array transform over the token array (no
      window, no per-doc shuffle: sequence + transform + explode);
    * two grouped counts (unigram, bigram) with map-side partial agg;
    * the unigram table broadcasts (vocab << corpus); the bigram join
      keys on (w1, w2) — content-keyed, AQE handles residual skew (hot
      stopword-stopword bigrams are bounded by language statistics);
    * one per-doc re-aggregation.

    ``materialize`` (default True) checkpoints the exploded bigram frame
    once: it feeds both the count-training pass and the scoring join, and
    Catalyst does not share the subplan — without it the tokenize+explode
    runs twice per consumer (6 corpus scans measured in the full plan).
    """
    t = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), t.alias("_t")).where(F.size("_t") >= 2)
    bg = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - 2),
                lambda i: F.struct(
                    F.element_at("_t", i + 1).alias("w1"),
                    F.element_at("_t", i + 2).alias("w2"),
                ),
            )
        ).alias("_b"),
    ).select(id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    if materialize:
        bg = bg.localCheckpoint(eager=True)

    tok = docs.select(F.explode(t).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("c1"))
    total = uni.agg(F.sum("c1").alias("t"))
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c1").alias("_c1")))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c1").alias("_cu")))
    p = (
        F.lit(lam) * F.col("c2").cast("double") / F.col("_c1").cast("double")
        + (1 - lam) * F.col("_cu").cast("double") / F.col("t").cast("double")
    )
    per_doc = (
        bg.join(bi, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(F.exp(-F.avg(F.log(p))).alias("_ppl"))
    )
    return docs.join(per_doc, id_col, "left").withColumn(
        "perplexity_bigram",
        F.round(F.coalesce(F.col("_ppl"), F.lit(0.0)), round_to),
    ).drop("_ppl")


def perplexity_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    lang_col: str = "lang",
    lam: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """DF(id, lang, ppl_bucket): CCNet-style head/middle/tail partition —
    per-language terciles of the interpolated bigram LM perplexity, lower
    perplexity (closer to the LM) = 'head'. RedPajama-v2's source corpus
    is sharded exactly this way ({lang}_head/{lang}_middle/{lang}_tail
    paths — the files the reference pipeline consumes,
    /root/reference/README.md:24-46).

    Plan: the bigram scorer's plan, then ONE groupBy(lang) exact-percentile
    aggregation (tiny result — one row per language — broadcast back) and a
    CASE label; the corpus side never shuffles for the labeling join. At
    100 TB swap exact=... semantics for percentile_approx as in
    operators/thresholds.py. Docs with < 2 tokens score 0.0 and land in
    head by construction; filter upstream if undesired.
    """
    p = 1.0 / 3.0
    # checkpoint: `scored` feeds both the tercile aggregation and the
    # labeling join; without it the whole LM scoring plan runs twice
    scored = with_bigram_perplexity(
        docs, id_col, text_col, lam, round_to
    ).select(id_col, lang_col, "perplexity_bigram").localCheckpoint(eager=True)
    th = scored.groupBy(lang_col).agg(
        F.round(
            F.expr(f"percentile(perplexity_bigram, {p!r})").cast("double"), 6
        ).alias("_p33"),
        F.round(
            F.expr(f"percentile(perplexity_bigram, {2 * p!r})").cast("double"), 6
        ).alias("_p67"),
    )
    bucket = (
        F.when(F.col("perplexity_bigram") <= F.col("_p33"), "head")
        .when(F.col("perplexity_bigram") <= F.col("_p67"), "middle")
        .otherwise("tail")
    )
    return scored.join(F.broadcast(th), lang_col).select(
        id_col, lang_col, bucket.alias("ppl_bucket")
    )


def char_bigram_model(docs: DataFrame, text_col: str = "text") -> dict[str, float]:
    """Train an add-one-smoothed char-bigram LM; returns {bigram: logp(c2|c1)}.

    The count aggregation is distributed; only the tiny model is collected.
    """
    grams = docs.select(F.explode(char_ngrams(F.col(text_col), 2)).alias("g"))
    bi = grams.groupBy("g").agg(F.count("*").alias("c"))
    uni = bi.select(F.substring("g", 1, 1).alias("c1"), "c").groupBy("c1").agg(
        F.sum("c").alias("n")
    )
    vocab_size = bi.select(F.substring("g", 2, 1).alias("c2")).distinct().count()
    rows = (
        bi.join(uni, F.substring(bi.g, 1, 1) == uni.c1)
        .select("g", "c", "n")
        .collect()
    )
    return {
        r["g"]: math.log((r["c"] + 1.0) / (r["n"] + vocab_size)) for r in rows
    }


def char_bigram_perplexity_udf(spark: SparkSession, model: dict[str, float], vocab_logp: float):
    """Arrow-batched scorer over a broadcast model dict (no per-row Python
    in the plan: one pandas UDF node, vectorized batches)."""
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(DoubleType())
    def ppl(text: pd.Series) -> pd.Series:
        m = bc.value

        def score(s: str) -> float:
            if not s or len(s) < 2:
                return 0.0
            lp = 0.0
            n = len(s) - 1
            for i in range(n):
                lp += m.get(s[i : i + 2], vocab_logp)
            return math.exp(-lp / n)

        return text.fillna("").map(score)

    return ppl
