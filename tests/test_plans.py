"""Plan-quality gates (SURVEY.md §7 hard parts): no row-at-a-time Python
anywhere, filters/projections pushed to the parquet scan, broadcast joins
where intended, partition-count invariance of results."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpajama_v2_processing_spark.fixtures import write_pages
from redpajama_v2_processing_spark.plans.pipeline import label_documents
from redpajama_v2_processing_spark.operators.minhash_lsh import minhash_bands
from redpajama_v2_processing_spark.operators.thresholds import quantile_filter
from redpajama_v2_processing_spark.functions.signals import with_signals


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_python_eval_in_core_pipeline(pages_small):
    """The entire label pipeline must stay JVM-side: zero Python eval nodes
    (the reference is 100% per-row Python; our contract is 0%)."""
    plan = _physical(label_documents(pages_small, id_col="url"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # not even vectorized python needed
    plan2 = _physical(minhash_bands(pages_small, "url"))
    assert "EvalPython" not in plan2


def test_scan_pushdown(spark, tmp_path):
    src = str(tmp_path / "pp")
    write_pages(spark, src, n_rows=100, seed=5, partitions=2)
    df = spark.read.parquet(src).where(F.col("lang") == "en").select("url", "lang")
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: html/text must not be read
    assert "ReadSchema: struct<url:string,lang:string>" in plan


def test_threshold_join_is_broadcast(pages_small):
    sig = with_signals(pages_small.withColumnRenamed("lang", "lang"))
    plan = _physical(quantile_filter(sig, ["number_of_words"]))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_profiled_thresholds_single_pass(pages_small):
    """profiled_quantile_filter must compute every profile's percentiles in
    ONE grouped aggregation — not one filtered scan per language. The plan
    therefore contains exactly 2 scans of the source (threshold side +
    filter side) regardless of language count, and one broadcast join."""
    from redpajama_v2_processing_spark.operators.thresholds import (
        profiled_quantile_filter,
    )

    sig = with_signals(pages_small)
    plan = _physical(profiled_quantile_filter(sig, ["number_of_words"]))
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ivf_assign_has_no_window_exchange(spark):
    """IVF-Flat cell assignment must be a grouped argmax (min_by — partial
    agg, map-side combine), never a row_number window over the K*n joined
    rows: at corpus scale the window exchange would dominate the plan."""
    from redpajama_v2_processing_spark.operators.ann import ann_ivf_topk

    df = spark.createDataFrame(
        [(i, i % 3, [float(i), 1.0, 0.5, -0.25]) for i in range(30)],
        "vec_id long, label long, embedding array<float>",
    )
    plan = _physical(ann_ivf_topk(df, [1.0, 0.0, 0.0, 0.0], n_probe=2, k=5))
    assert "Window" not in plan


def test_star_dedup_plans_have_no_cartesian(spark):
    """The star-edge dedup paths must stay equi-join shaped: no cartesian
    or broadcast-nested-loop fallback anywhere in either plan."""
    from redpajama_v2_processing_spark.operators.ann import (
        embedding_dedup_star_keep,
    )
    from redpajama_v2_processing_spark.operators.simhash_dedup import (
        simhash_dedup_keep,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} words tokens here") for i in range(20)],
        "doc_id long, text string",
    )
    p1 = _physical(simhash_dedup_keep(docs, "doc_id", bits=60, band_bits=15))
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, -0.5, 0.25]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    p2 = _physical(
        embedding_dedup_star_keep(emb, 0.95, dim=4, nbits=8, band_bits=4)
    )
    for plan in (p1, p2):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_covers_signals(pages_small):
    plan = _physical(with_signals(pages_small).select("url", "number_of_words"))
    # "*(n)" prefixes mark WholeStageCodegen stages in the short plan form
    assert "*(1)" in plan


def test_decontaminate_probe_is_broadcast(spark):
    """The benchmark n-gram membership probe must be a broadcast hash
    join (the benchmark side is tiny vs the corpus) with no cartesian
    fallback and no Python eval anywhere."""
    from redpajama_v2_processing_spark.operators.decontaminate import (
        contaminated_ids,
    )

    docs = spark.createDataFrame(
        [(i, "word " * 20 + str(i)) for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, "word " * 15)], "bid long, text string")
    plan = _physical(contaminated_ids(docs, bench, "doc_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_pq_adc_scan_is_broadcast_and_native(spark):
    """PQ ADC: the m x k lookup-table join must broadcast, and the whole
    train/encode/score program stays JVM-side (zero Python eval)."""
    from redpajama_v2_processing_spark.operators.pq import ann_pq_topk

    emb = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 7) for j in range(8)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    plan = _physical(ann_pq_topk(emb, [1.0] * 8, m=2, k_codes=4, iters=1, dim=8))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_full_pipeline_frees_intermediate_cache(spark, pages_small):
    """full_pipeline(eager=True) must not leave its internal survivor
    cache persisted after the call: the only new persistent RDD is the
    returned result's own localCheckpoint (context-cleaned when the
    DataFrame is dropped) — a long-lived session running many pipelines
    must not accumulate caches."""
    from redpajama_v2_processing_spark.operators.connected_components import (
        _persistent_ids,
    )
    from redpajama_v2_processing_spark.plans.pipeline import full_pipeline

    sc = spark.sparkContext
    docs = pages_small.select(
        F.xxhash64("url").alias("doc_id"), "text", "lang"
    )
    before = _persistent_ids(sc)
    out = full_pipeline(docs)
    assert out.count() > 0
    new = _persistent_ids(sc) - before
    # exactly the result checkpoint survives; the survivors cache is gone
    assert len(new) <= 1


def test_domain_cap_windows_are_skew_capped(spark):
    """domain_cap must never window the full row stream on the bare domain
    key (one reducer per hot host): under-cap domains bypass windows via a
    broadcast anti-join, and over-cap rows rank inside (domain, salt)
    groups first — every Window whose input is unbounded carries the salt.
    Verified on a hot-domain fixture (1 host = 96% of rows) for both plan
    shape and exact result parity with the naive formulation."""
    from pyspark.sql import Window

    from redpajama_v2_processing_spark.operators.sampling import domain_cap

    rows = [(i, "hot.example") for i in range(960)] + [
        (1000 + i, f"cold{i % 8}.example") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = domain_cap(df, "doc_id", cap=15)
    got = {(r.source, r.doc_id) for r in out.collect()}
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    naive = {
        (r.source, r.doc_id)
        for r in df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 15).drop("_rk").collect()
    }
    assert got == naive
    assert sum(1 for s, _ in got if s == "hot.example") == 15

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the first (unbounded-input) window partitions by (source, _salt);
    # the bare-source window exists but only over the <= n_salts*cap
    # pre-pruned survivors. So: salted window present, and the plan's
    # window count is exactly 2.
    assert "_salt" in plan
    assert plan.count("RunningWindowFunction") + plan.count("Window ") >= 1
    # under-cap rows take the broadcast anti-join path, never a window
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_bloom_probe_path_is_narrow(spark):
    """The Bloom maybe-contains probe must be k broadcast-join lookups —
    no sort-merge join and no exchange of the probe-side corpus (the
    only exchanges in the full plan belong to the bitmap build and the
    maybe-row verification join)."""
    from redpajama_v2_processing_spark.operators.exact_dedup import (
        bloom_bitmap, bloom_maybe_contains)

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    dups = docs.where(F.col("doc_id") % 7 == 0)
    bm = bloom_bitmap(dups, "doc_id").localCheckpoint(eager=True)
    plan = _physical(bloom_maybe_contains(docs, F.col("doc_id"), bm))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 5  # k probes
    # probe side reads the checkpointed bitmap; the only allowed exchanges
    # are broadcast exchanges for it
    import re
    non_broadcast_exchanges = re.findall(r"Exchange (?!SinglePartition)(?!broadcast)\w+", plan)
    assert not any("hashpartitioning" in e for e in non_broadcast_exchanges), plan


def test_round5_queries_stay_jvm_side(spark):
    """No Python eval nodes and no cartesian products in any round-5
    query plan; token_budget_mix additionally must not contain a Window
    (its scale contract is agg + broadcast join + generate only)."""
    from redpajama_v2_processing_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    for name in ["url_canonicalize", "url_dedup_keep", "url_blocklist",
                 "token_budget_mix", "span_dedup", "paragraph_dedup",
                 "gopher_filter", "ccnet_pipeline", "contamination_report",
                 "chunk_documents", "dedup_cluster_sizes",
                 "token_offsets", "pack_blocks", "temperature_mix",
                 "scrub_cc_luhn", "incremental_fuzzy_keep",
                 "incremental_exact_keep", "vocab_coverage", "oov_rate",
                 "source_quality_report", "encoding_noise",
                 "substring_dedup", "script_ratios", "block_doc_histogram",
                 "doc_embeddings", "shard_manifest", "lang_script_mismatch",
                 "jaccard_sim_histogram", "source_overlap"]:
        plan = _physical(Q.QUERIES[name](spark, sf))
        assert "EvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
    mix = _physical(Q.QUERIES["token_budget_mix"](spark, sf))
    assert "Window" not in mix


def test_round6_queries_plan_gates(spark):
    """rpv2_exact_keep: pure relational interop (regexp repair + anti
    join), no Python eval, no cartesian, no window. wet_ingest is
    excluded by design — its parse IS Arrow mapInPandas (the binary
    ingest tier); assert it is ArrowEvalPython-shaped, not row-Python."""
    from redpajama_v2_processing_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    plan = _physical(Q.QUERIES["rpv2_exact_keep"](spark, sf))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "Window" not in plan

    wet = _physical(Q.QUERIES["wet_ingest"](spark, sf))
    assert "MapInPandas" in wet or "ArrowEvalPython" in wet
    assert "BatchEvalPython" not in wet  # never row-at-a-time Python


def test_semdedup_and_jaccard_plan_shape(spark):
    """SemDeDup: assignment is grouped min_by (no Window), keep rule is
    grouped min_by (no Window), no Python eval; the only nested-loop join
    is the broadcast centroid cross join (k rows — by design, same as the
    IVF family). Jaccard dedup: pure equi-join shape — no cartesian, no
    nested-loop fallback, no Python eval, no Window."""
    from redpajama_v2_processing_spark.operators.jaccard_dedup import (
        ngram_jaccard_dedup_keep,
    )
    from redpajama_v2_processing_spark.operators.semdedup import semdedup_keep

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, -0.5, 0.25]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    p1 = _physical(semdedup_keep(emb, 0.95, k_cells=2, iters=1))
    assert "EvalPython" not in p1
    assert "CartesianProduct" not in p1
    assert "Window" not in p1

    docs = spark.createDataFrame(
        [(i, f"some doc {i} tokens words here") for i in range(20)],
        "doc_id long, text string",
    )
    p2 = _physical(ngram_jaccard_dedup_keep(docs, "doc_id"))
    assert "EvalPython" not in p2
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2
    assert "Window" not in p2


def test_full_pipeline_matches_explicit_composition(spark, pages_small):
    """Round-7 restructure guard: the window-dedup + CC-label pipeline
    must return exactly the rows of the r6 composition (label chain +
    exact_keep_ids left_semi + fuzzy_dedup_keep_ids left_semi)."""
    from redpajama_v2_processing_spark.config import PROD_MINHASH
    from redpajama_v2_processing_spark.operators.exact_dedup import exact_keep_ids
    from redpajama_v2_processing_spark.operators.minhash_lsh import (
        fuzzy_dedup_keep_ids,
    )
    from redpajama_v2_processing_spark.plans.pipeline import (
        full_pipeline, label_documents,
    )

    docs = pages_small.select(F.xxhash64("url").alias("doc_id"), "text", "lang")
    labeled = label_documents(docs).where(F.col("keep"))
    exact = exact_keep_ids(labeled, "doc_id")
    survivors = labeled.join(exact, "doc_id", "left_semi")
    fuzzy = fuzzy_dedup_keep_ids(
        survivors, "doc_id", cfg=PROD_MINHASH, base="xxhash", salted=True
    ).withColumnRenamed("id", "doc_id")
    want = {
        r.doc_id for r in survivors.join(fuzzy, "doc_id", "left_semi").collect()
    }
    out = full_pipeline(docs)
    got = {r.doc_id for r in out.collect()}
    assert got == want
    assert set(out.columns) == set(survivors.columns)
