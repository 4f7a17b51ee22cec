"""Connected components vs a brute-force python union-find on adversarial
graph shapes (path graphs are the worst case for star algorithms)."""

from __future__ import annotations

import random

from redpajama_v2_processing_spark.operators.connected_components import (
    connected_components,
)


def _uf_roots(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to component-min
    nodes = {n for e in edges for n in e}
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    want = _uf_roots(edges)
    # distributed large-star/small-star fixpoint
    got = {r.id: r.root for r in connected_components(df, driver_threshold=0).collect()}
    assert got == want
    # driver-side union-find fast path
    got2 = {r.id: r.root for r in connected_components(df).collect()}
    assert got2 == want


def test_path_graph(spark):
    _check(spark, [(i, i + 1) for i in range(20)])


def test_two_components_and_star(spark):
    edges = [(100, i) for i in range(101, 110)] + [(1, 2), (2, 3)]
    _check(spark, edges)


def test_reversed_path(spark):
    _check(spark, [(i + 1, i) for i in range(15)])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_duplicate_and_self_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (3, 4)])
