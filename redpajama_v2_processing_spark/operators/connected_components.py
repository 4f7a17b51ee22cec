"""Distributed connected components: alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond").

Replaces the reference's single-process UnionFind over all LSH buckets
(src/union_find.py:45-81, driven at src/minhashlsh.py:131-145) — the
component that forced the reference into iterative partial dedups when the
id set outgrew node RAM (README.md:101-124). Here every round is two
shuffles over the edge set; convergence is O(log n) rounds; lineage is cut
with localCheckpoint each round so plans stay bounded.

Output invariant (matches the reference's keep rule,
src/minhashlsh.py:140,169): every node maps to its component's MINIMUM id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    nbrs = _symmetric(edges)
    mins = nbrs.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least(F.col("_mn"), F.col("src")).alias("m")
    )
    return (
        nbrs.where(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; for each u: m = min(smaller nbrs ∪ {u});
    emit (v, m) for v in smaller-nbrs ∪ {u}, v != m."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    to_small = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_small.union(self_edge)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _persistent_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _unpersist(sc, ids: set[int]) -> None:
    m = sc._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        if int(k) in ids:
            m.get(k).unpersist()


def _driver_side_cc(edges: DataFrame, edge_rows) -> DataFrame:
    """Small-graph fast path: classic union-find on the driver.

    After LSH star-edge compression the edge set is usually tiny relative
    to the corpus (one edge per duplicate doc per band). Below the
    threshold, ~10 Spark jobs of fixpoint latency collapse into one
    collect + one createDataFrame. Identical output contract."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = find(r["src"]), find(r["dst"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comps: dict[int, list[int]] = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    rows = [
        (n, min(members)) for root, members in comps.items() for n in members
    ]
    return edges.sparkSession.createDataFrame(rows, "id long, root long")


def connected_components(
    edges: DataFrame, max_iter: int = 50, driver_threshold: int | None = None
) -> DataFrame:
    """edges: DF(src:long, dst:long) undirected. Returns DF(id, root) for
    every node appearing in the edge set; root = component min id.

    Each round is localCheckpoint-ed (lineage truncation: without it the
    plan doubles per round and analysis time explodes). Superseded rounds'
    checkpoint blocks are explicitly unpersisted once the final result is
    materialized — iterative checkpoints are the classic slow-leak that
    degrades every later job in the session. At warehouse scale, persist
    the returned frame to a table (tableio) rather than holding it cached.
    """
    if driver_threshold is None:
        from ..config import CC_DRIVER_THRESHOLD

        driver_threshold = CC_DRIVER_THRESHOLD
    sc = edges.sparkSession.sparkContext
    pre_existing = _persistent_ids(sc)
    # NO distinct here: every in-repo edge producer already emits distinct
    # pairs (candidate_edges/salted_bucket_edges/simhash/winnow/jaccard all
    # end in .distinct(), the verify paths consume distinct candidates), so
    # the old upfront distinct was one full exchange of the edge set per
    # dedup query for nothing. Duplicate edges are tolerated everywhere
    # downstream: union-find is idempotent, the star rounds distinct
    # internally, and the row-count threshold merely turns conservative
    # (duplicates can push a small graph onto the distributed path, never
    # the reverse). The checkpoint now materializes a narrow filter.
    cur = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )
    if driver_threshold > 0:
        # hybrid strategy: graphs under the threshold are union-found on
        # the driver; only genuinely large graphs pay the distributed
        # fixpoint. count + collect over the cached blocks is two
        # PREDICTABLE one-pass jobs; take(threshold+1) ran up to 4
        # scale-up passes (initialNumPartitions=1, x4 per step) because a
        # small edge set never fills the limit.
        if cur.count() <= driver_threshold:
            result = _driver_side_cc(edges, cur.collect())
            _unpersist(sc, _persistent_ids(sc) - pre_existing)
            return result
    prev_sig = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        # modded hash-sum avoids ANSI long-overflow on large edge sets
        sig = cur.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1_000_000_007))),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    loop_ids = _persistent_ids(sc) - pre_existing
    # converged: every edge is (node, component_min); add roots themselves
    nodes = cur.select(F.col("src").alias("id"), F.col("dst").alias("root"))
    roots = cur.select(F.col("dst").alias("id"), F.col("dst").alias("root")).distinct()
    result = (
        nodes.union(roots).groupBy("id").agg(F.min("root").alias("root"))
        .localCheckpoint()  # eager: materialized before inputs are freed
    )
    final_ids = _persistent_ids(sc) - pre_existing - loop_ids
    _unpersist(sc, loop_ids - final_ids)
    return result


def keep_min_id(ids: DataFrame, cc: DataFrame) -> DataFrame:
    """DF(id): the dedup family's shared keep rule — ids whose component
    root is themselves. ``ids`` must be a single-column (id) frame of
    every candidate id; ids absent from the label frame (singletons and
    unsignable inputs) keep themselves via the null-root coalesce."""
    return (
        ids.join(cc, "id", "left")
        .where(F.coalesce("root", F.col("id")) == F.col("id"))
        .select("id")
    )
