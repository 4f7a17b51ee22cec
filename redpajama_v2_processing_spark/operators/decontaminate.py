"""Benchmark decontamination: remove training documents that overlap an
evaluation set by long n-gram collision — the GPT-3/Gopher/Llama
training-data hygiene step (a doc sharing a verbatim 13-gram with a
benchmark item leaks that item into training).

Relational formulation, no per-row Python: both sides explode to hashed
word n-grams (portable md5int over the space-joined gram); the benchmark
side is tiny versus the corpus, so its distinct gram table BROADCASTS and
the corpus never shuffles for the membership probe — only the per-doc
hit-count aggregation exchanges on the doc id (map-side combinable).
At 100 TB: benchmark sets are a few MB of n-grams; the whole operator is
one broadcast join over a projected two-column frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int
from ..functions.text import tokens

DECONTAM_NGRAM = 13  # the GPT-3 standard overlap length (words)


def ngram_hash_frame(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = DECONTAM_NGRAM
) -> DataFrame:
    """DF(id, gh): distinct hashed word n-grams per document. Docs with
    fewer than ``n`` tokens emit nothing (they cannot contain an n-gram)."""
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= n)
    ex = base.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_t) - {n} + 1),"
                f" i -> array_join(slice(_t, i, {n}), ' '))"
            )
        ).alias("_g"),
    )
    return ex.select("id", md5int(F.col("_g")).alias("gh")).distinct()


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECONTAM_NGRAM,
    min_hits: int = 1,
) -> DataFrame:
    """DF(id, hits): corpus docs sharing >= ``min_hits`` DISTINCT n-grams
    with any benchmark document."""
    dg = ngram_hash_frame(docs, id_col, text_col, n)
    bg = (
        ngram_hash_frame(bench, bench.columns[0], bench_text_col, n)
        .select("gh")
        .distinct()
    )
    return (
        dg.join(F.broadcast(bg), "gh")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("hits"))
        .where(F.col("hits") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DECONTAM_NGRAM,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs (left_anti against the flagged ids;
    with AQE the tiny flag table broadcasts the anti join too)."""
    bad = contaminated_ids(
        docs, bench, id_col, text_col, bench_text_col, n, min_hits
    ).select(F.col("id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")
