"""SemDeDup (embedding-space semantic dedup) and exact n-gram Jaccard
dedup — behavior and keep-rule tests (oracle equivalence is covered by
tools/check_queries.py / the driver gate)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from redpajama_v2_processing_spark.operators.jaccard_dedup import (
    ngram_jaccard_dedup_keep, ngram_jaccard_pairs,
)
from redpajama_v2_processing_spark.operators.semdedup import (
    semdedup_assign, semdedup_keep,
)
from tests.conftest import docs_frame


def _emb_frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _semdedup_fixture(spark):
    """10 dispersed random vectors + a planted trio of noisy copies."""
    rng = np.random.RandomState(23)
    base = rng.randn(64)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(10)]
    for j in range(3):
        noisy = base + 0.01 * rng.randn(64)
        rows.append((100 + j, [float(x) for x in noisy]))
    return _emb_frame(spark, rows)


def test_semdedup_collapses_planted_cluster(spark):
    df = _semdedup_fixture(spark)
    kept = sorted(r.id for r in semdedup_keep(df, 0.95, k_cells=4, iters=2).collect())
    survivors_of_cluster = [i for i in kept if i >= 100]
    assert len(survivors_of_cluster) == 1
    assert [i for i in kept if i < 100] == list(range(10))


def test_semdedup_keep_rule_is_least_central_member(spark):
    """The survivor of a duplicate group must be its member with the
    LOWEST centroid cosine (ties to min id) — the paper's keep rule,
    cross-checked through the independent semdedup_assign surface."""
    df = _semdedup_fixture(spark)
    kept = {r.id for r in semdedup_keep(df, 0.95, k_cells=4, iters=2).collect()}
    assign = {
        r.id: r.ccos
        for r in semdedup_assign(df, k_cells=4, iters=2).collect()
    }
    cluster = [100, 101, 102]
    expected = min(cluster, key=lambda i: (assign[i], i))
    assert kept & set(cluster) == {expected}


def test_semdedup_k_cells_derived_from_corpus(spark):
    """k_cells=None derives the cell count from the corpus (paper recipe:
    hold cell WIDTH constant, floor 8) — no fixture-sized constant on the
    scale knob (r5 verdict item 4)."""
    from redpajama_v2_processing_spark.operators.semdedup import derive_k_cells

    # pure derivation: ceil(n / width), floored at 8
    assert derive_k_cells(0) == 8
    assert derive_k_cells(500) == 8
    assert derive_k_cells(50_000) == 8  # 5 cells of 10k -> floor binds
    assert derive_k_cells(50_000, target_cell_width=1_000) == 50
    assert derive_k_cells(80_001) == 9  # ceil, not floor
    # LAION-440M at the default width lands near the paper's 50k clusters
    assert derive_k_cells(440_000_000) == 44_000

    # end-to-end: the default actually trains the derived k (a fixed k=8
    # default could never produce >8 distinct cells)
    emb = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            ((F.col("id") * 3) % 11).cast("double"),
            ((F.col("id") * 5) % 13).cast("double"),
            ((F.col("id") * 7) % 17).cast("double"),
        ).alias("embedding"),
    )
    assign = semdedup_assign(emb, iters=2, target_cell_width=50)  # k = 40
    n_cells = assign.select("cid").distinct().count()
    assert 8 < n_cells <= 40


def test_semdedup_idempotent(spark):
    df = _semdedup_fixture(spark)
    kept1 = semdedup_keep(df, 0.95, k_cells=4, iters=2)
    survivors = df.join(
        kept1.select(F.col("id").alias("vec_id")), "vec_id", "left_semi"
    )
    kept2 = sorted(
        r.id for r in semdedup_keep(survivors, 0.95, k_cells=4, iters=2).collect()
    )
    assert kept2 == sorted(r.id for r in kept1.collect())


def test_jaccard_pairs_exact_values(spark):
    # shingle(3): doc0/doc1 = {a b c, b c d} identical; doc2 = {a b c, b c x}
    df = docs_frame(spark, ["a b c d", "a b c d", "a b c x", "q r s t u"])
    pairs = {
        (r.src, r.dst): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", threshold=0.0).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == round(1 / 3, 6)
    assert pairs[(1, 2)] == round(1 / 3, 6)
    assert not any(3 in p for p in pairs)


def test_jaccard_threshold_and_keep(spark):
    df = docs_frame(spark, ["a b c d", "a b c d", "a b c x", "q r s t u"])
    pairs = ngram_jaccard_pairs(df, "doc_id", threshold=0.6).collect()
    assert {(r.src, r.dst) for r in pairs} == {(0, 1)}
    kept = sorted(
        r.id for r in ngram_jaccard_dedup_keep(df, "doc_id", threshold=0.6).collect()
    )
    assert kept == [0, 2, 3]


def test_jaccard_stop_gram_bound(spark):
    """Docs overlapping ONLY through a gram with df > max_df generate no
    candidate pairs (the boilerplate stop-gram prune)."""
    texts = [f"common boiler plate u{i} v{i} w{i}" for i in range(12)]
    df = docs_frame(spark, texts)
    assert (
        ngram_jaccard_pairs(df, "doc_id", threshold=0.0, max_df=10).count() == 0
    )
    # every doc survives the keep (no edges at all)
    assert ngram_jaccard_dedup_keep(df, "doc_id", max_df=10).count() == 12


def test_jaccard_unsignable_docs_kept(spark):
    df = docs_frame(spark, ["a b c d", "a b c d", None, ""])
    kept = sorted(r.id for r in ngram_jaccard_dedup_keep(df, "doc_id").collect())
    assert kept == [0, 2, 3]


def test_semdedup_malformed_vector_guard(spark):
    """A wrong-length vector must not poison the cell structure (NULL
    zip_with cosines sort first in min_by): it is excluded from
    training/assignment and kept as a singleton; dedup of the
    well-formed vectors is unchanged."""
    df = _semdedup_fixture(spark)
    bad = _emb_frame(spark, [(999, [1.0] * 65)])
    kept = sorted(
        r.id for r in semdedup_keep(
            df.unionByName(bad), 0.95, k_cells=4, iters=2
        ).collect()
    )
    base = sorted(r.id for r in semdedup_keep(df, 0.95, k_cells=4, iters=2).collect())
    assert kept == sorted(base + [999])


def test_text_to_semdedup_chain_in_engine(spark):
    """The closed loop: text -> doc_embeddings -> semdedup_keep with no
    external model. Normalization-equal texts embed identically, so one
    of each identical pair is dropped; distinct texts survive."""
    from redpajama_v2_processing_spark.operators.embeddings import doc_embeddings
    from redpajama_v2_processing_spark.operators.semdedup import semdedup_keep

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),
         (1, "ALPHA beta   gamma delta epsilon"),   # dup of 0
         (2, "totally different words entirely here"),
         (3, "yet another unique document body text")],
        "doc_id long, text string",
    )
    emb = doc_embeddings(docs, "doc_id", dim=16).select(
        F.col("id").alias("vec_id"), F.col("embedding")
    )
    kept = sorted(
        r.id for r in semdedup_keep(emb, 0.99, k_cells=2, iters=2, dim=16).collect()
    )
    assert 2 in kept and 3 in kept
    assert len([i for i in kept if i in (0, 1)]) == 1
