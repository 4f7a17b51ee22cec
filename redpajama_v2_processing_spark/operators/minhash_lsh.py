"""MinHash-LSH fuzzy deduplication — the band-bucket shuffle.

Reference flow (src/minhashlsh.py:87-193): one python process builds
``hash_tables[band][band_hash] -> id set`` in RAM, then union-finds the
buckets. Spark realization:

  shingles -> minhash signature -> band hashes   (one native expression)
  posexplode(bands) -> shuffle on (band_idx, band_hash)  ["band-bucket shuffle"]
  window-min per bucket -> star edges (id, bucket_min)
  connected components (large-star/small-star)
  keep = ids whose component root == id          (src/minhashlsh.py:140,169)

Skew note: boilerplate pages create hot (band_idx, band_hash) buckets. The
star-edge construction is already linear in bucket size (no all-pairs
explosion), and `salted_bucket_edges` caps per-reducer bucket width via a
two-level salt + re-merge, preserving connectivity (the salt groups of one
bucket are re-linked through the global bucket min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import ORACLE_MINHASH
from ..functions.hashing import PERM_PRIME, md5int, perm_coeffs
from ..functions.text import tokens, word_ngrams, normalize
from .connected_components import connected_components


def shingles_of(tok, norm, n: int):
    """Word n-gram shingles from staged token/norm columns; docs shorter
    than n words fall back to a single whole-text shingle so no doc is
    unsignable. ``tok``/``norm`` should be plain column refs (staged via
    ``with_shingles``) — inlining the split here is quadratic."""
    return F.when(
        F.size(tok) < n,
        F.when(F.trim(norm) == "", F.array().cast("array<string>")).otherwise(
            F.array(norm)
        ),
    ).otherwise(F.array_distinct(word_ngrams(tok, n)))


def shingles(text_col, n: int):
    """Inline shingle expression — ONLY for single-row lookups (e.g. the
    jaccard query doc); use ``with_shingles`` for whole-corpus scans."""
    norm = normalize(text_col)
    return shingles_of(tokens(norm), norm, n)


def with_shingles(
    docs: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """DF(id, _sh): staged shingle arrays.

    N-gram construction uses pyspark.ml.feature.NGram (Scala sliding-window
    over the token array, identical " "-joined output) instead of a
    ``transform(sequence, ...)`` lambda: Catalyst evaluates array lambdas
    interpreted, which made shingling the hottest op in the whole engine.
    Null text -> null shingles (doc unsignable, kept by dedup — mirrors the
    reference's null-signature guard, src/minhashlsh.py:112)."""
    from pyspark.ml.feature import NGram

    base = (
        docs.select(F.col(id_col).alias("id"), normalize(F.col(text_col)).alias("_norm"))
        .withColumn("_tok", tokens(F.col("_norm")))
        .withColumn("_tok_safe", F.coalesce("_tok", F.array().cast("array<string>")))
    )
    ng = NGram(n=n, inputCol="_tok_safe", outputCol="_ng").transform(base)
    norm_c, tok_c = F.col("_norm"), F.col("_tok_safe")
    sh = (
        F.when(norm_c.isNull(), F.lit(None).cast("array<string>"))
        .when(
            F.size(tok_c) < n,
            F.when(F.trim(norm_c) == "", F.array().cast("array<string>")).otherwise(
                F.array(norm_c)
            ),
        )
        .otherwise(F.array_distinct(F.col("_ng")))
    )
    return ng.select("id", sh.alias("_sh"))


def minhash_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
) -> DataFrame:
    """DF(id, band_idx, band_hash) — one row per (doc, band).

    Flat, whole-stage-codegen formulation: explode shingles, compute the
    num_perm hash columns per (doc, shingle) row, hash-aggregate per-perm
    minima (map-side combine shrinks the shuffle to one row per doc per
    partition), then band hashes from the minima. ~100x faster than the
    equivalent nested higher-order-function expression, which Spark
    evaluates interpreted (no codegen inside array lambdas).

    Every profile hashes the (variable-length) shingle string ONCE and
    derives the k permutations with the universal integer family
    (a_i*h32 + b_i mod P — pure codegen arithmetic; hashing per
    permutation would cost k string hashes per shingle). ``base`` is the
    single portability knob: ``"md5"`` (default) uses the md5int base hash
    so the IDENTICAL arithmetic runs in the DuckDB oracle; ``"xxhash"``
    uses JVM-native xxhash64 — the deployed profile, differing ONLY in
    that base hash.
    """
    if base not in ("md5", "xxhash"):
        raise ValueError(f"base must be 'md5' or 'xxhash', got {base!r}")
    k, b, r = cfg["num_perm"], cfg["bands"], cfg["rows"]
    flat = with_shingles(docs, id_col, text_col, cfg["shingle"]).select(
        "id", F.explode("_sh").alias("_s")
    )
    base_h = F.xxhash64("_s") if base == "xxhash" else md5int(F.col("_s"))
    coeffs = perm_coeffs(k)
    hashed = flat.withColumn(
        "_h32", F.pmod(base_h, F.lit(1 << 32))
    ).select(
        "id",
        *[
            ((F.lit(a) * F.col("_h32") + F.lit(bb)) % F.lit(PERM_PRIME)).alias(f"_h{i}")
            for i, (a, bb) in enumerate(coeffs)
        ],
    )
    minh = hashed.groupBy("id").agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(k)]
    )

    band_portable = base == "md5"

    def band_hash(bi: int):
        joined = F.concat_ws(
            "|", *[F.col(f"_m{bi * r + j}").cast("string") for j in range(r)]
        )
        payload = F.concat(F.lit(str(bi)), F.lit("#"), joined)
        return md5int(payload) if band_portable else F.xxhash64(payload)

    bands = F.array(
        *[
            F.struct(F.lit(bi).alias("band_idx"), band_hash(bi).alias("band_hash"))
            for bi in range(b)
        ]
    )
    return minh.select("id", F.explode(bands).alias("_bh")).select(
        "id", F.col("_bh.band_idx"), F.col("_bh.band_hash")
    )


def lsh_buckets(bands_df: DataFrame) -> DataFrame:
    """DF(band_idx, band_hash, n_docs, min_id) for buckets with >=2 docs."""
    return (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("min_id"))
        .where(F.col("n_docs") >= 2)
    )


def candidate_edges(bands_df: DataFrame) -> DataFrame:
    """Star edges (src=id, dst=bucket_min) per bucket, id != min.

    Linear in bucket size (vs the quadratic all-pairs a naive LSH join
    emits); connectivity within a bucket is preserved through its min.
    One shuffle (the band-bucket exchange); window-min avoids a join.
    """
    w = Window.partitionBy("band_idx", "band_hash")
    return (
        bands_df.withColumn("_min", F.min("id").over(w))
        .where(F.col("id") != F.col("_min"))
        .select(F.col("id").alias("src"), F.col("_min").alias("dst"))
        .distinct()
    )


def salted_bucket_edges(bands_df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Skew-capped variant: split each (band,hash) bucket into
    ``salt_buckets`` salt groups, take per-group mins, then link the group
    mins through the global bucket min. Connectivity is identical; the
    per-reducer working set shrinks by the salt factor."""
    w_g = Window.partitionBy("band_idx", "band_hash", "_salt")
    w_b = Window.partitionBy("band_idx", "band_hash")
    # _bmin FIRST: the coarse (band, hash) exchange it forces also
    # satisfies the salted window's ClusteredDistribution (its keys are a
    # superset), so the _gmin window needs only a re-sort — one Exchange
    # for both windows instead of two (guide §2.4; plans/r07/*salted*).
    x = (
        bands_df.withColumn("_salt", F.pmod(F.xxhash64("id"), F.lit(salt_buckets)))
        .withColumn("_bmin", F.min("id").over(w_b))
        .withColumn("_gmin", F.min("id").over(w_g))
    )
    # one edge per row: members link to their salt-group min; the group
    # leader (id == _gmin) links its group min to the bucket min. Single
    # pass, no union (a union of two subtrees sharing this window plan
    # trips a Catalyst DeduplicateRelations bug under AQE in Spark 4.1).
    edge = F.when(
        F.col("id") != F.col("_gmin"),
        F.struct(F.col("id").alias("src"), F.col("_gmin").alias("dst")),
    ).when(
        F.col("_gmin") != F.col("_bmin"),
        F.struct(F.col("_gmin").alias("src"), F.col("_bmin").alias("dst")),
    )
    return (
        x.select(edge.alias("_e"))
        .where(F.col("_e").isNotNull())
        .select("_e.src", "_e.dst")
        .distinct()
    )


def fuzzy_dedup_labels(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    salted: bool = False,
    cc_driver_threshold: int | None = None,
) -> DataFrame:
    """DF(id, root): component root per doc id (root==id for singletons)."""
    bands = minhash_bands(docs, id_col, text_col, cfg, base)
    edges = salted_bucket_edges(bands) if salted else candidate_edges(bands)
    cc = connected_components(edges, driver_threshold=cc_driver_threshold)
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(cc, "id", "left").select(
        "id", F.coalesce("root", F.col("id")).alias("root")
    )


def dedup_cluster_sizes(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    salted: bool = False,
) -> DataFrame:
    """DF(cluster_size, n_clusters): near-dup component-size histogram
    (singletons included) — the dedup monitoring surface (how much mass
    sits in big boilerplate clusters vs pairs). Two grouped counts over
    the label frame; the histogram is tiny at any corpus size."""
    labels = fuzzy_dedup_labels(docs, id_col, text_col, cfg, base, salted)
    sizes = labels.groupBy("root").agg(F.count("*").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters")
    )


def fuzzy_dedup_keep_ids(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    salted: bool = False,
    cc_driver_threshold: int | None = None,
) -> DataFrame:
    """DF(id): the keep-list — one doc (the min id) per near-dup component,
    singletons included. Mirrors src/minhashlsh.py:169 (keep root==id)."""
    labels = fuzzy_dedup_labels(
        docs, id_col, text_col, cfg, base, salted, cc_driver_threshold
    )
    return labels.where(F.col("root") == F.col("id")).select("id")


def fuzzy_dedup_keep_best(
    docs: DataFrame,
    id_col: str,
    score: Column,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    salted: bool = False,
    cc_driver_threshold: int | None = None,
) -> DataFrame:
    """DF(id): one doc per near-dup component — the member with the
    HIGHEST ``score`` (a Column over ``docs``; ties to the smaller id),
    singletons included.

    The min-id rule (fuzzy_dedup_keep_ids, mirroring the reference
    src/minhashlsh.py:169) keeps an ARBITRARY cluster member — fine when
    members are interchangeable, wasteful when a near-dup cluster mixes
    truncated/paginated variants of the same page with the complete one
    (the common web case). Production pipelines keep the best member
    instead (FineWeb-style representative selection); the canonical
    score is document length — see queries.q_fuzzy_dedup_keep_longest.

    Scale shape: identical to fuzzy_dedup_keep_ids through the label
    frame (banded LSH + star CC); representative selection is ONE
    row_number window partitioned by component root — partitions are
    cluster widths (bounded by the same bucket caps that bound the edge
    set), never corpus-sized.
    """
    labels = fuzzy_dedup_labels(
        docs, id_col, text_col, cfg, base, salted, cc_driver_threshold
    )
    scored = docs.select(F.col(id_col).alias("id"), score.alias("_score")).join(
        labels, "id"
    )
    w = Window.partitionBy("root").orderBy(
        F.col("_score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id")
    )


# ---------------------------------------------------------------------------
# Incremental (cross-crawl) fuzzy dedup
# ---------------------------------------------------------------------------
#
# The reference's cross-crawl mode (src/minhashlsh.py:237-268 loads every
# prior crawl's signatures next to the new one and re-clusters the union in
# one process) re-pays the full history each crawl. The engine-native
# incremental tier freezes history: the already-deduplicated corpus
# contributes only its distinct LSH band keys (an index table written once
# per crawl and reused — 2 integer columns, no text, no signatures), and a
# new crawl is deduplicated in two steps that never re-cluster history:
#
#   1. drop every new doc sharing a band key with history (near-dup of an
#      already-kept doc; the same banding recall curve as intra-corpus LSH)
#   2. cluster the survivors among themselves (star edges + CC) and keep
#      one doc per component — identical machinery to fuzzy_dedup_keep_ids
#
# Scale shape: the history index is keys-only and grows with the KEPT
# corpus, not the crawl stream; both probes are shuffles on (band_idx,
# band_hash) with partial aggregation; nothing corpus-sized reaches the
# driver. History-privileged keep order mirrors the reference's min-id
# rule (old crawls carry smaller ids, so the union-mode min-id winner IS
# the history doc).


def band_key_index(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
) -> DataFrame:
    """DF(band_idx, band_hash): the distinct LSH band keys of a corpus —
    the frozen-history index the incremental tier probes against. In
    production this is written as a table once per accepted crawl and
    unioned/compacted, never recomputed from text."""
    return (
        minhash_bands(docs, id_col, text_col, cfg, base)
        .select("band_idx", "band_hash")
        .distinct()
    )


def incremental_fuzzy_keep_ids(
    new_docs: DataFrame,
    history: DataFrame | None,
    id_col: str,
    text_col: str = "text",
    cfg: dict = ORACLE_MINHASH,
    base: str = "md5",
    history_bands: DataFrame | None = None,
    salted: bool = False,
    cc_driver_threshold: int | None = None,
) -> DataFrame:
    """DF(id): ids of ``new_docs`` kept after incremental fuzzy dedup
    against a frozen ``history`` corpus.

    A new doc is dropped iff (a) any of its band keys appears in the
    history band-key index, or (b) it loses the within-new clustering
    (same star-edge + connected-components keep rule as
    ``fuzzy_dedup_keep_ids``, run over the surviving docs' bands only).
    Unsignable docs (null text) have no bands, collide with nothing, and
    are kept — the family's null-signature guard.

    Pass ``history_bands`` (from :func:`band_key_index`, possibly read
    back from its table) to skip re-hashing history text.
    """
    if history_bands is None:
        if history is None:
            raise ValueError("need history or history_bands")
        history_bands = band_key_index(history, id_col, text_col, cfg, base)
    # nb feeds the hit probe AND the survivor frame; hit feeds the
    # survivor frame AND the keep ids. Catalyst does not share subplans,
    # so checkpoint both (nb's shingle+banding chain is the dominant cost)
    nb = minhash_bands(new_docs, id_col, text_col, cfg, base).localCheckpoint(
        eager=True
    )
    hit = (
        nb.join(history_bands, ["band_idx", "band_hash"], "left_semi")
        .select("id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    surv_bands = nb.join(hit, "id", "left_anti")
    edges = (
        salted_bucket_edges(surv_bands) if salted else candidate_edges(surv_bands)
    )
    cc = connected_components(edges, driver_threshold=cc_driver_threshold)
    ids = new_docs.select(F.col(id_col).alias("id")).join(hit, "id", "left_anti")
    from .connected_components import keep_min_id

    return keep_min_id(ids, cc)
