"""Okapi BM25 keyword retrieval over the document corpus.

The embedding ANN family (operators/ann.py) answers "find documents
near this VECTOR"; this operator answers the text-side twin — "find
documents matching these QUERY TERMS" — the retrieval surface a
curation workflow uses to audit what a corpus contains (e.g. pull the
top pages for a contamination probe phrase, inspect the highest-BM25
boilerplate for a blocklist candidate) without training embeddings
first. The reference has no retrieval tier (it only filters); this is
engine-native capability in the spirit of its quality audits
(/root/reference/src/quality_signals.py consumes precomputed signals —
here the index statistics are computed in-engine).

Scoring is standard Lucene-style BM25 (Robertson idf with the +1
floor, so weights never go negative):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d)   = sum over query terms of idf * tfnorm

Determinism contract (same as functions/perplexity.py and the
doc_embeddings idf): each per-(doc, term) contribution is rounded to
INTEGER MICRO-UNITS (round(x * 1e6) as bigint) and the per-doc score
is the bigint SUM of those — order-independent by construction, so
Spark's partial aggregation and DuckDB's single-threaded sum agree
bit-for-bit. Every double in the formula is a pure per-row expression
over exact integers (tf, df, dl, N, sum_dl) written with identical
operation order in both engines; no floating-point accumulators.

Scale shape (100 TB contract): the corpus is scanned ONCE; the explode
is filtered to QUERY TERMS ONLY before any shuffle, so the exchange
carries |docs containing >= 1 query term| * |matched terms| rows, not
corpus tokens. Document length rides the explode projection (dl is a
groupBy key, constant per doc) — no corpus-wide length join. The df
table is |query terms| rows (broadcast); the global (N, sum_dl) stats
frame is one row (broadcast crossJoin, the repo-wide pattern for
scalar stats). Top-k is TakeOrdered — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# oracle-profile BM25 constants; 0.75 is exact in binary, 1.2 appears
# as the same literal in both engines so the doubles are identical
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    query: str,
    text_col: str = "text",
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """DF(doc_id, score_micro, n_terms): top-k documents by BM25 against
    the whitespace-tokenized ``query`` string; ties broken by smaller id.
    ``score_micro`` is the exact bigint micro-unit score (portable);
    ``n_terms`` counts distinct query terms matched."""
    terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("bm25_topk: query has no tokens")

    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).select("id", F.size("_t").cast("long").alias("dl"), F.explode("_t").alias("tok"))

    # corpus-wide scalar stats: N docs + total token mass (exact bigints).
    # dl is re-derived narrowly (size of the token array, no explode) so
    # the stats scan never pays the exploded row count.
    lens = docs.select(F.size(tokens(F.col(text_col))).cast("long").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("long").alias("n"), F.sum("dl").alias("s")
    )

    # filter to query terms BEFORE the shuffle; dl is constant per id so
    # it rides the groupBy key instead of a corpus-wide join
    tf = (
        base.where(F.col("tok").isin(terms))
        .groupBy("id", "dl", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfc = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfc), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + ((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_tfn",
            (F.col("tf").cast("double") * F.lit(1.0 + k1))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("dl").cast("double")
                    * F.col("n").cast("double")
                    / F.col("s").cast("double")
                )
            ),
        )
        .withColumn(
            "_c", F.round(F.col("_idf") * F.col("_tfn") * F.lit(1e6)).cast("bigint")
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("_c").alias("score_micro"),
            F.count("*").cast("long").alias("n_terms"),
        )
        .select(F.col("id").alias("doc_id"), "score_micro", "n_terms")
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(k)
    )
