"""BM25 retrieval + quality-aware dedup representative selection."""

from __future__ import annotations

from redpajama_v2_processing_spark.operators.bm25 import bm25_topk
from redpajama_v2_processing_spark.operators.minhash_lsh import (
    fuzzy_dedup_keep_best,
    fuzzy_dedup_keep_ids,
)
from pyspark.sql import functions as F


def _corpus(spark):
    rows = [
        (1, "apple apple apple pie recipe with sugar and butter"),
        (2, "apple orchard visit notes from the autumn harvest trip"),
        (3, "banana bread recipe with sugar and butter and flour"),
        (4, "completely unrelated text about spark shuffle partitions"),
        (5, "apple"),  # tiny doc: one occurrence, very short dl
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_rewards_short_docs(spark):
    top = bm25_topk(_corpus(spark), "doc_id", "apple", k=10).collect()
    got = [r["doc_id"] for r in top]
    # only docs containing the term appear
    assert set(got) == {1, 2, 5}
    scores = {r["doc_id"]: r["score_micro"] for r in top}
    # tf=3 beats tf=1 at comparable length; tf=1 in a 1-token doc beats
    # tf=1 in a 9-token doc (length normalization)
    assert scores[1] > scores[2]
    assert scores[5] > scores[2]
    assert all(r["n_terms"] == 1 for r in top)


def test_bm25_idf_downweights_common_terms(spark):
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows += [(9, "common rare"), (10, "common filler")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, "doc_id", "rare common", k=3).collect()
    # the one doc matching the rare term dominates every common-only doc
    assert top[0]["doc_id"] == 9
    assert top[0]["n_terms"] == 2
    rare_only = [r for r in top if r["doc_id"] == 9][0]
    assert rare_only["score_micro"] > 2 * top[1]["score_micro"]


def test_bm25_empty_query_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), "doc_id", "   ")


def test_keep_best_prefers_longest_cluster_member(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # min-id baseline: clusters keep their smallest id
    min_keep = {r["id"] for r in fuzzy_dedup_keep_ids(docs, "doc_id").collect()}
    from redpajama_v2_processing_spark.functions.text import ws_token_count

    best_keep = {
        r["id"]
        for r in fuzzy_dedup_keep_best(
            docs, "doc_id", ws_token_count("text")
        ).collect()
    }
    # one representative per component either way: same keep count
    assert len(best_keep) == len(min_keep)
    # singletons (docs in no cluster) survive under both rules
    labels = {r["doc_id"] for r in docs.select("doc_id").collect()}
    dropped_min = labels - min_keep
    dropped_best = labels - best_keep
    assert len(dropped_min) == len(dropped_best)


def test_keep_best_picks_max_score_not_min_id(spark):
    # two near-identical docs; the LONGER one has the LARGER id, so the
    # min-id rule and the keep-best rule must disagree on this cluster
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (10, base),
        (20, base + "extra trailing sentence about the same fox story"),
        (99, "a completely different standalone document about parquet"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from redpajama_v2_processing_spark.functions.text import ws_token_count

    min_keep = {r["id"] for r in fuzzy_dedup_keep_ids(docs, "doc_id").collect()}
    best_keep = {
        r["id"]
        for r in fuzzy_dedup_keep_best(
            docs, "doc_id", ws_token_count("text")
        ).collect()
    }
    assert 99 in min_keep and 99 in best_keep
    if min_keep == {10, 99}:  # the pair actually clustered
        assert best_keep == {20, 99}
    else:  # profile didn't band them together: both rules keep all three
        assert best_keep == min_keep


def test_keep_best_tie_breaks_to_smaller_id(spark):
    rows = [
        (7, "identical twin text body for the tie break case one two"),
        (3, "identical twin text body for the tie break case one two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {
        r["id"]
        for r in fuzzy_dedup_keep_best(docs, "doc_id", F.lit(1)).collect()
    }
    assert keep == {3}
