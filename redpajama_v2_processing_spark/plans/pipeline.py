"""End-to-end pipeline composition over a documents/pages table.

Mirrors the reference's four-stage flow (README.md:4-7: download -> exact
dedup -> quality filter -> fuzzy dedup) as one declarative DataFrame DAG,
plus the signal computation the reference outsourced. Stage-checkpointed,
resumable execution lives in tableio.py / run_pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.langid import with_langid
from ..functions.scrub import scrub_pii
from ..functions.signals import with_signals
from ..functions.text import fingerprint_int
from ..operators.connected_components import connected_components
from ..operators.exact_dedup import exact_keep_ids
from ..operators.minhash_lsh import minhash_bands, salted_bucket_edges
from ..operators.quality_filter import with_quality_label
from ..config import PROD_MINHASH


def label_documents(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """signals + langid + keep/drop labels + scrubbed text. Narrow
    (no shuffle): staged projections over the scan."""
    out = with_langid(with_quality_label(with_signals(docs, text_col)), text_col)
    return (
        out.withColumn("scrubbed_text", scrub_pii(F.col(text_col)))
        .withColumn("fingerprint", fingerprint_int(F.col(text_col)))
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter pipeline over the documents table: labels + scrub +
    exact-dedup survivor flag. Returns one row per input doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = label_documents(docs)
    keep_ids = exact_keep_ids(docs, "doc_id").withColumn("exact_keep", F.lit(True))
    return (
        labeled.join(keep_ids, "doc_id", "left")
        .withColumn("exact_keep", F.coalesce("exact_keep", F.lit(False)))
        .select(
            "doc_id", "lang", "langid", "langid_score", "keep", "drop_reason",
            "number_of_words", "stop_word_fraction", "special_char_ratio",
            "scrubbed_text", "fingerprint", "exact_keep",
        )
    )


def full_pipeline(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", eager: bool = True) -> DataFrame:
    """The reference's complete corpus-production semantics in one DAG:
    quality filter -> exact dedup -> fuzzy dedup; returns surviving docs
    with labels. (Batch composition; the checkpointed staged variant is
    tableio.run_stages.)

    ``eager=True`` (default) materializes the result once via
    localCheckpoint while the intermediate survivor cache is live, then
    frees that cache — no dangling persisted intermediate after the call
    (the result's own checkpoint blocks belong to the returned DataFrame
    and are context-cleaned when it is dropped). ``eager=False`` returns
    the fully lazy plan and the caller owns the survivor cache lifetime
    (``.unpersist()`` any persisted inputs after the final action)."""
    labeled = label_documents(docs, id_col, text_col).where(F.col("keep"))
    # exact dedup as ONE row_number window over the fingerprint column the
    # label stage already computed: the previous exact_keep_ids + left_semi
    # composition evaluated the full label chain TWICE (Catalyst shares no
    # subplans, and the quality-keep filter forces the signal expressions on
    # both sides) and paid two exchanges (groupBy fingerprint + semi join on
    # id); this is one label pass and one exchange (guide §2.4). Result rows
    # are identical: min id per fingerprint among quality-kept docs. Skew
    # note: a hot fingerprint is an identical-text flood — the window
    # reducer streams that bucket linearly, the same worst case the semi
    # join's build side had.
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    survivors = (
        labeled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    # fuzzy keep applied as ONE left join against the (dup-cluster-sized)
    # CC label frame instead of keep-ids + a second corpus-wide semi join:
    # root == id (or no root) keeps the doc — identical keep rule to
    # fuzzy_dedup_keep_ids, one fewer corpus shuffle.
    bands = minhash_bands(survivors, id_col, text_col, PROD_MINHASH, "xxhash")
    cc = connected_components(salted_bucket_edges(bands)).withColumnRenamed(
        "id", id_col
    )
    out = (
        survivors.join(cc, id_col, "left")
        .where(F.coalesce("root", F.col(id_col)) == F.col(id_col))
        .drop("root")
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        survivors.unpersist()
    return out
