"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``: brute-force exact top-k vs a query vector — the
  baseline. One scan, no shuffle except the final top-k (orderBy+limit is
  a TakeOrderedAndProject: per-partition heaps, driver merges k rows).
* ``hyperplane_signature`` / ``ann_lsh_topk``: random-hyperplane LSH —
  the scale path. Planes are derived deterministically from md5 (seeded),
  so signatures are reproducible everywhere; candidates = query's bucket,
  re-ranked exactly.

Cosines are rounded (config.ANN_ROUND) before ranking so cross-engine
float-sum noise (~1e-15) cannot flip orderings; ties break on vec_id.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ANN_ROUND, ANN_TOPK
from ..functions.vectors import cosine, round_half_up


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = ANN_TOPK,
) -> DataFrame:
    """DF(vec_id, cos) — exact top-k by rounded cosine, ties by id."""
    c = round_half_up(cosine(F.col(vec_col), _lit_vec(query_vec)), ANN_ROUND)
    return (
        embeddings.select(F.col(id_col), c.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


@lru_cache(maxsize=16)
def plane_weights(dim: int, nbits: int) -> tuple[tuple[float, ...], ...]:
    """The hyperplane constants: plane p, component d =
    ((md5int('p:d') mod 2001) - 1000)/1000, a reproducible pseudo-random
    value in [-1, 1] (md5int = first 15 hex chars of md5 as int — the
    engine's portable hash contract). Materialized ONCE on the driver and
    inlined as literals: the planes are constants, so evaluating dim*nbits
    md5 calls per ROW (the previous formulation) was pure waste."""
    def w(p: int, d: int) -> float:
        h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
        return ((h % 2001) - 1000) / 1000.0

    return tuple(tuple(w(p, d) for d in range(dim)) for p in range(nbits))


def _plane_bit(vec_col: Column, planes, p: int, shift: int) -> Column:
    """(1 << shift) iff round(dot(vec, plane_p), 6) > 0 else 0."""
    w_arr = F.array(*[F.lit(w) for w in planes[p]])
    d = F.aggregate(
        F.zip_with(vec_col, w_arr, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(round_half_up(d, 6) > 0, F.lit(1 << shift).cast("bigint")).otherwise(
        F.lit(0).cast("bigint")
    )


def hyperplane_signature(vec_col: Column, dim: int, nbits: int) -> Column:
    """Deterministic random-hyperplane LSH signature (bigint).

    Bit p = 1 iff round(dot(vec, plane_p), 6) > 0 (rounded so the sign is
    stable under cross-engine float noise). Weights are literal arrays —
    the per-row work is dim multiply-adds per plane and nothing else (a
    fully flat expansion was tried first: 512 inlined terms overflow a
    janino method and deoptimize the whole stage to interpreted anyway).
    """
    planes = plane_weights(dim, nbits)
    out = _plane_bit(vec_col, planes, 0, 0)
    for p in range(1, nbits):
        out = out + _plane_bit(vec_col, planes, p, p)
    return out


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    k: int = ANN_TOPK,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket, rank exactly.

    At cluster scale the bucket column is a partition/bucketing key, so the
    probe prunes to one bucket's files instead of scanning the corpus.
    """
    sig = hyperplane_signature(F.col(vec_col), dim, nbits)
    bucketed = embeddings.withColumn("_bucket", sig)
    qdf = bucketed.sparkSession.createDataFrame(
        [(query_vec,)], f"{vec_col}: array<float>"
    )
    qsig = qdf.select(hyperplane_signature(F.col(vec_col), dim, nbits).alias("b")).collect()[0]["b"]
    c = round_half_up(cosine(F.col(vec_col), _lit_vec(query_vec)), ANN_ROUND)
    return (
        bucketed.where(F.col("_bucket") == qsig)
        .select(F.col(id_col), c.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def banded_keys_frame(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    nbits: int,
    band_bits: int,
) -> DataFrame:
    """DF(_id, band, key): banded hyperplane keys, whole-stage-codegen
    formulation — the production signature path.

    A Column-expression formulation (folding each dot product with
    F.aggregate, as hyperplane_signature does) evaluates INTERPRETED —
    higher-order functions are CodegenFallback — and measured ~12x slower
    than this at 50k x 64-plane vectors. Here the vector explodes to
    (id, pos, x), joins the
    broadcast (pos -> w_0..w_{nbits-1}) weight table, and ONE hash
    aggregation computes all nbits dots as integer micro-unit sums
    (sum of round(x*w*1e6) as bigint — exact integers, so the value is
    independent of summation order and both engines agree bit-for-bit);
    bit p = d_p > 0. Fully codegen, partial aggregation map-side, the
    exchange carries one row per vector.

    Note the bit rule differs in rounding from hyperplane_signature
    (per-term micro-unit rounding vs round(double dot, 6)) — the two
    formulations are distinct, internally-consistent LSH families; the
    production queries and their oracles use THIS one."""
    planes = plane_weights(dim, nbits)
    spark = embeddings.sparkSession
    rows = [(pos, *[planes[p][pos] for p in range(nbits)]) for pos in range(dim)]
    wdf = spark.createDataFrame(
        rows, "pos int, " + ", ".join(f"_w{p} double" for p in range(nbits))
    )
    # input contract: dense dim-length vectors. NULL/short vectors are
    # dropped EXPLICITLY (and identically in the oracle twin,
    # _hyperplane_band_ctes) — without the filter, posexplode silently
    # drops NULLs here while a SQL twin would emit key-0 band rows.
    ex = embeddings.where(F.size(F.col(vec_col)) == dim).select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "_x"),
    )
    sums = (
        ex.join(F.broadcast(wdf), "pos")
        .groupBy("_id")
        .agg(
            *[
                F.sum(
                    F.round(F.col("_x") * F.col(f"_w{p}") * 1e6).cast("bigint")
                ).alias(f"_d{p}")
                for p in range(nbits)
            ]
        )
    )

    def key(b: int) -> Column:
        out = F.when(F.col(f"_d{b * band_bits}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        for j in range(1, band_bits):
            out = out + F.when(
                F.col(f"_d{b * band_bits + j}") > 0, F.lit(1 << j).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return out

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), key(b).alias("key"))
            for b in range(nbits // band_bits)
        ]
    )
    return sums.select("_id", F.explode(bands).alias("_bk")).select(
        "_id", "_bk.band", "_bk.key"
    )


def ann_multiprobe_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    k: int = ANN_TOPK,
) -> DataFrame:
    """Multiprobe hyperplane-LSH top-k: probe the query's bucket PLUS all
    nbits Hamming-1 neighbor buckets (query signature with one bit
    flipped), rerank candidates exactly.

    The standard recall fix for single-bucket LSH: a true neighbor whose
    signature differs in exactly one low-margin plane lands in a Hamming-1
    bucket, so probing them recovers most of the loss without touching the
    index layout — candidates grow only (nbits+1)-fold over one bucket
    (still ~n(nbits+1)/2^nbits of the corpus). The probe set is nbits+1
    literals, so at warehouse scale it prunes to nbits+1 bucket partitions.
    """
    sig = hyperplane_signature(F.col(vec_col), dim, nbits)
    bucketed = embeddings.withColumn("_bucket", sig)
    qdf = bucketed.sparkSession.createDataFrame(
        [(query_vec,)], f"{vec_col}: array<float>"
    )
    qsig = qdf.select(
        hyperplane_signature(F.col(vec_col), dim, nbits).alias("b")
    ).collect()[0]["b"]
    probes = [qsig] + [qsig ^ (1 << p) for p in range(nbits)]
    c = round_half_up(cosine(F.col(vec_col), _lit_vec(query_vec)), ANN_ROUND)
    return (
        bucketed.where(F.col("_bucket").isin(probes))
        .select(F.col(id_col), c.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    band_bits: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """DF(src, dst, cos), src < dst: embedding near-duplicates — LSH
    candidate pairs with rounded cosine >= threshold (never all-pairs).

    ``band_bits=None`` (oracle test profile): one bucket = the FULL
    nbits-plane signature; candidates ~n^2/2^nbits. Fine for small nbits
    test fixtures, quadratic-over-a-constant at corpus scale.

    ``band_bits=r`` (production, config.PROD_EMB_LSH): the signature is
    split into nbits/r bands; candidates = UNION over bands of per-band
    bucket joins, deduped BEFORE the cosine verify. Per-band key space is
    2^r, so expected bucket width is n/2^r — pick r so 2^r >> corpus
    bucket count (r=16 -> 65,536 keys/band). Recall for vectors at angle
    theta: 1 - (1 - (1-theta/pi)^r)^(nbits/r) — near-identical vectors
    (cos >= 0.99) collide on >=1 band with p > 0.92 at 64/16, while random
    pairs collide with p ~ (nbits/r)/2^r. Same banding scheme as
    PROD_MINHASH / PROD_SIMHASH (the reference's band scheme,
    /root/reference/src/minhashlsh.py:101).

    Plan shape (banded): explode band keys (id + 2 ints per row — vectors
    do NOT travel through the band shuffle), equi-self-join per (band,
    key), distinct (src, dst), then re-join the vectors for the exact
    cosine verify. The distinct collapses multi-band hits before the
    expensive cosine, and both verify joins shuffle on the id key.

    ``max_bucket`` (banded path only) caps each (band, key) bucket at its
    ``max_bucket`` smallest ids before the self-join: dense half-space
    clusters otherwise make bucket width grow with corpus size and the
    join quadratic again; the cap bounds any bucket to C(cap, 2) pairs
    (approximation — members beyond the cap can still match through
    another band; oracle-pinned in the prod queries).
    """
    from ..functions.vectors import norm as _vnorm
    from ..functions.vectors import staged_cosine, verify_partitions

    def _pair_cos():
        # norms precomputed per VECTOR (columns _na/_nb staged on the join
        # sides): see functions/vectors.staged_cosine for the economics
        return staged_cosine(
            F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), ANN_ROUND
        )

    if band_bits is None:
        sig = hyperplane_signature(F.col(vec_col), dim, nbits)
        b = embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("_bucket")
        ).withColumn("_n", _vnorm(F.col("_v")))
        a = b.select(F.col("_id").alias("src"), F.col("_v").alias("_va"),
                     F.col("_n").alias("_na"), "_bucket")
        c = b.select(F.col("_id").alias("dst"), F.col("_v").alias("_vb"),
                     F.col("_n").alias("_nb"), "_bucket")
        return (
            a.join(c, "_bucket")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst", _pair_cos().alias("cos"))
            .where(F.col("cos") >= threshold)
        )
    banded = banded_keys_frame(embeddings, id_col, vec_col, dim, nbits, band_bits)
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy("_id")
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    # checkpoint: both self-join sides consume the banded frame (no
    # subplan sharing in Catalyst — the signature aggregation would run
    # once per side). Explicit repartition on the join key first: the
    # byte-tiny banded aggregate otherwise AQE-coalesces to ONE partition
    # and the checkpoint pins the whole bucket self-join onto one core
    # (the semdedup r6 lesson); (band, key) partitioning also lets the
    # self-join reuse the checkpoint partitioning — no further exchange.
    banded = banded.repartition(
        verify_partitions(embeddings), "band", "key"
    ).localCheckpoint(eager=True)
    a = banded.select(F.col("_id").alias("src"), "band", "key")
    c = banded.select(F.col("_id").alias("dst"), "band", "key")
    # explicit repartition of the ids-only candidate frame: byte-based AQE
    # coalescing otherwise concentrates the row-count-proportional
    # interpreted verify onto few cores (the semdedup lesson, BENCH.md r6)
    cand = (
        a.join(c, ["band", "key"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .repartition(verify_partitions(embeddings), "src", "dst")
    )
    va = embeddings.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("_va")
    ).withColumn("_na", _vnorm(F.col("_va")))
    vb = embeddings.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("_vb")
    ).withColumn("_nb", _vnorm(F.col("_vb")))
    return (
        cand.join(va, "src")
        .join(vb, "dst")
        .select("src", "dst", _pair_cos().alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    band_bits: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """DF(id): keep-list — one vector (min id) per near-dup component
    (connected components over the near-dup pair graph), singletons kept.
    Same keep rule as the text dedup family (root == id)."""
    from .connected_components import connected_components, keep_min_id

    pairs = embedding_near_dup_pairs(
        embeddings, threshold, id_col, vec_col, dim, nbits, band_bits, max_bucket
    )
    cc = connected_components(pairs.select("src", "dst"))
    ids = embeddings.select(F.col(id_col).alias("id"))
    return keep_min_id(ids, cc)


def embedding_dedup_star_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 64,
    band_bits: int = 16,
) -> DataFrame:
    """DF(id): keep-list via STAR edges — the linear-candidate production
    dedup path for embeddings.

    The pairs formulation (embedding_near_dup_pairs) emits every
    same-bucket pair: candidate volume is bands*n^2/2^band_bits even on
    random data — quadratic over a constant, and no per-bucket cap fixes
    that (measured: the cap never binds on dispersed small buckets,
    BENCH.md). Here each bucket member links only to its bucket MIN id
    (one grouped arg_min aggregation), the single edge is verified with
    rounded cosine >= threshold, and connected components assign roots:
    candidates <= n * n_bands BY CONSTRUCTION — the same star-edge shape
    that keeps MinHash-LSH linear (operators/minhash_lsh.candidate_edges).

    Recall model: a vector near-identical to a bucket-mate but not to the
    bucket min still clusters when any of the other bands links it;
    near-dup clusters at high cosine share most band keys, so their
    members reach a common min with probability ~the banding recall curve.
    """
    from .connected_components import connected_components, keep_min_id

    # the banded frame feeds the bucket-min aggregation AND the join back;
    # Catalyst does not share subplans, so without this the 64-sum banding
    # aggregation (the dominant cost) computes twice — same checkpoint the
    # pairs path takes at embedding_near_dup_pairs. Repartitioned on the
    # bucket key before the checkpoint (anti-AQE-serialization + both
    # consumers reuse the partitioning; see embedding_near_dup_pairs).
    from ..functions.vectors import norm as _vnorm
    from ..functions.vectors import staged_cosine, verify_partitions

    banded = banded_keys_frame(
        embeddings, id_col, vec_col, dim, nbits, band_bits
    ).repartition(verify_partitions(embeddings), "band", "key").localCheckpoint(
        eager=True
    )
    buckets = banded.groupBy("band", "key").agg(F.min("_id").alias("_min_id"))

    # ids-only star candidates explicitly repartitioned + per-vector norm
    # staging — the same interpreted-verify economics as the pairs path
    # and semdedup (BENCH.md r6); arithmetic identical to the inline form
    cand = (
        banded.join(buckets, ["band", "key"])
        .where(F.col("_id") != F.col("_min_id"))
        .select(F.col("_id").alias("src"), F.col("_min_id").alias("dst"))
        .distinct()
        .repartition(verify_partitions(embeddings), "src", "dst")
    )
    va = embeddings.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("_va")
    ).withColumn("_na", _vnorm(F.col("_va")))
    vb = embeddings.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("_vb")
    ).withColumn("_nb", _vnorm(F.col("_vb")))
    cos = staged_cosine(
        F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), ANN_ROUND
    )
    edges = (
        cand.join(va, "src")
        .join(vb, "dst")
        .where(cos >= threshold)
        .select("src", "dst")
    )
    cc = connected_components(edges)
    ids = embeddings.select(F.col(id_col).alias("id"))
    return keep_min_id(ids, cc)


def exact_mean4(col: Column) -> Column:
    """Aggregate: order-independent 4-decimal mean. Per-value fixed-point
    micro-units summed as exact integers, then the quotient floor((2n+d)/(2d))
    (ties toward +inf): double summation order differs across
    engines/partitionings, and float rounding of exact half boundaries
    differs between Spark and DuckDB, so the SUM must stay integral. The
    division itself is IEEE double division in both engines (bigint `/` is
    double-valued in Spark and DuckDB alike), so the result is
    cross-engine-deterministic — but exactly at a half boundary the
    quotient's half-ulp can cross the floor edge, deviating from true
    HALF_UP. Keep 2*sum(|x|*1e6) well below 2^53 per group (bounded
    signals easily satisfy this with margin, keeping the quotient ulp
    below 1/den)."""
    num = F.sum(F.round(col.cast("double") * 1e6).cast("bigint")) * 2
    den = F.count("*") * 200
    return (
        F.floor((num + F.count("*") * 100) / den).cast("bigint") / F.lit(10000.0)
    )


def _centroid_vectors(
    embeddings: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """DF(label, cv): per-label mean vector via exact_mean4 so both
    engines derive bit-identical centroids regardless of float summation
    order (+0.0 normalizes -0.0)."""
    return (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg((exact_mean4(F.col("x")) + 0.0).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("cv")
        )
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_probe: int = 3,
    k: int = ANN_TOPK,
) -> DataFrame:
    """IVF-Flat approximate top-k: a coarse quantizer (per-label centroid
    vectors) assigns every vector to its nearest cell; the query probes its
    ``n_probe`` nearest cells and reranks only those vectors exactly.

    The scale path alongside hyperplane LSH: candidates shrink to
    ~n_probe/K of the corpus, the centroid table (K rows) broadcasts, and
    at warehouse scale the assigned cell is a partition key so the probe
    prunes files. Everything is rounded at ANN_ROUND before ranking (ties
    on label/id) so the plan is engine-portable and oracle-checked.
    """
    cent = F.broadcast(_centroid_vectors(embeddings, label_col, vec_col))
    ccos = round_half_up(cosine(F.col(vec_col), F.col("cv")), ANN_ROUND)
    # assignment argmax as ONE partial-agg-friendly aggregation:
    # min_by over (-cos, label) == max cos, ties to the smallest label.
    # (The previous row_number window shuffled all K*n joined rows on id;
    # min_by combines map-side, so the exchange carries one row per id.)
    assign = (
        embeddings.select(id_col, vec_col)
        .join(cent)
        .withColumn("_ccos", ccos)
        .groupBy(id_col)
        .agg(
            F.min_by(
                "label", F.struct((-F.col("_ccos")).alias("a"), F.col("label").alias("b"))
            ).alias("label")
        )
    )
    qcos = round_half_up(cosine(_lit_vec(query_vec), F.col("cv")), ANN_ROUND)
    probe = (
        cent.select("label", qcos.alias("_qc"))
        .orderBy(F.col("_qc").desc(), F.col("label").asc())
        .limit(n_probe)
        .select("label")
    )
    # select only (id, vec) first: embeddings' own label column must not
    # shadow the ASSIGNED cell label in the probe semi-join
    cand = embeddings.select(id_col, vec_col).join(assign, id_col).join(
        F.broadcast(probe), "label", "left_semi"
    )
    c = round_half_up(cosine(F.col(vec_col), _lit_vec(query_vec)), ANN_ROUND)
    return (
        cand.select(F.col(id_col), c.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DF(cid, cv): spherical k-means centroids after ``iters`` Lloyd
    iterations — the trained coarse quantizer for IVF (ann_ivf_topk's
    per-label cells assume a label column; this learns cells from the
    vectors alone).

    Deterministic and engine-portable BY CONSTRUCTION, so the whole
    iterative algorithm is oracle-checkable: init = the k smallest ids'
    vectors; assignment = argmax ROUNDED cosine (ties to smallest cid,
    the min_by grouped argmax — no window); update = exact_mean4 per
    component (order-independent integer-exact means). Every iteration is
    one broadcast join + two partial-agg-friendly aggregations; lineage is
    cut per iteration with localCheckpoint so the plan stays O(1) deep.
    Cells that lose all members disappear (k can shrink) — identically in
    both engines.
    """
    from .connected_components import _persistent_ids, _unpersist

    emb = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = emb.orderBy("id").limit(k).select(
        F.col("id").alias("cid"), F.col("v").alias("cv")
    )
    sc = embeddings.sparkSession.sparkContext
    prev_ids: set[int] = set()
    # vector norms precomputed ONCE (and centroid norms once per
    # iteration, k rows): the inline cosine would re-fold norm(v) k times
    # per vector and norm(cv) n times per centroid on the n*k assignment
    # path — see functions/vectors.staged_cosine for the economics.
    from ..functions.vectors import norm as _vnorm
    from ..functions.vectors import staged_cosine

    embn = emb.withColumn("_nv", _vnorm(F.col("v")))
    for _ in range(iters):
        centn = cent.withColumn("_nc", _vnorm(F.col("cv")))
        ccos = staged_cosine(
            F.col("v"), F.col("cv"), F.col("_nv"), F.col("_nc"), ANN_ROUND
        )
        assign = (
            embn.join(F.broadcast(centn))
            .withColumn("_c", ccos)
            .groupBy("id")
            .agg(
                F.min_by(
                    "cid", F.struct((-F.col("_c")).alias("a"), F.col("cid").alias("b"))
                ).alias("cid")
            )
        )
        before = _persistent_ids(sc)
        cent = (
            emb.join(assign, "id")
            .select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg((exact_mean4(F.col("x")) + 0.0).alias("c"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
                ).alias("cv")
            )
            .localCheckpoint()
        )
        # free the superseded iteration's checkpoint blocks (the classic
        # iterative-checkpoint slow leak — same hygiene as the CC fixpoint);
        # the final centroids stay materialized for the caller.
        _unpersist(sc, prev_ids)
        prev_ids = _persistent_ids(sc) - before
    return cent


def kmeans_cells(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DF(cid, pos, centroid): kmeans_centroids exploded to one row per
    centroid component (the oracle-comparable surface)."""
    return kmeans_centroids(embeddings, k, iters, id_col, vec_col).select(
        F.col("cid").cast("long").alias("cid"),
        F.posexplode("cv").alias("pos", "centroid"),
    ).select("cid", F.col("pos").cast("long").alias("pos"), "centroid")


def ann_ivf_trained_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    iters: int = 3,
    n_probe: int = 3,
    k: int = ANN_TOPK,
) -> DataFrame:
    """IVF-Flat top-k over TRAINED cells: kmeans_centroids learns the
    coarse quantizer from the vectors (no label column needed), then the
    usual IVF probe — assign every vector to its nearest cell (grouped
    argmax, no window), probe the query's n_probe nearest cells, rerank
    those vectors exactly. At warehouse scale the assigned cell is the
    partition key and training cost amortizes over every query."""
    cent = F.broadcast(
        kmeans_centroids(embeddings, k_cells, iters, id_col, vec_col)
    )
    ccos = round_half_up(cosine(F.col(vec_col), F.col("cv")), ANN_ROUND)
    assign = (
        embeddings.select(id_col, vec_col)
        .join(cent)
        .withColumn("_ccos", ccos)
        .groupBy(id_col)
        .agg(
            F.min_by(
                "cid", F.struct((-F.col("_ccos")).alias("a"), F.col("cid").alias("b"))
            ).alias("cid")
        )
    )
    qcos = round_half_up(cosine(_lit_vec(query_vec), F.col("cv")), ANN_ROUND)
    probe = (
        cent.select("cid", qcos.alias("_qc"))
        .orderBy(F.col("_qc").desc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    cand = embeddings.select(id_col, vec_col).join(assign, id_col).join(
        F.broadcast(probe), "cid", "left_semi"
    )
    c = round_half_up(cosine(F.col(vec_col), _lit_vec(query_vec)), ANN_ROUND)
    return (
        cand.select(F.col(id_col), c.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """DF(label, pos, centroid): per-label mean of each component.

    posexplode + two-level hash agg: partial means map-side, tiny result.
    """
    return (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        # +0.0 normalizes IEEE negative zero
        .agg((exact_mean4(F.col("x")) + 0.0).alias("centroid"))
    )
